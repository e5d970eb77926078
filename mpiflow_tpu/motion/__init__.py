from mpiflow_tpu.motion.pose import (
    ReferencePoseSampler,
    sample_pose_params,
    random_pose_jax,
    gen_swing_path,
)

__all__ = ["ReferencePoseSampler", "sample_pose_params", "random_pose_jax",
           "gen_swing_path"]
