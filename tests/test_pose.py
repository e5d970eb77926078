import numpy as np
import jax
import jax.numpy as jnp

from mpiflow_tpu.geom import transformation_from_parameters
from mpiflow_tpu.motion import (
    ReferencePoseSampler, random_pose_jax, gen_swing_path,
)


def _pose_to_mat(params):
    ang, trans = params
    return np.asarray(transformation_from_parameters(
        ang.astype(np.float32), trans.astype(np.float32)))


def test_reference_pose_stream_kitti_v2(golden):
    """Bit-parity with the reference's python-random pose stream."""
    g = golden("pose_stream")
    sampler = ReferencePoseSampler(114514, flavor="kitti_v2", ext_cz=0.15)
    for i in range(12):
        cam, obj = sampler.sample_pair()
        np.testing.assert_allclose(_pose_to_mat(cam), g["kitti_v2_cam"][i],
                                   atol=1e-6)
        np.testing.assert_allclose(_pose_to_mat(obj), g["kitti_v2_obj"][i],
                                   atol=1e-6)


def test_reference_pose_stream_coco(golden):
    g = golden("pose_stream")
    sampler = ReferencePoseSampler(114514, flavor="coco")
    for i in range(12):
        cam, obj = sampler.sample_pair()
        np.testing.assert_allclose(_pose_to_mat(cam), g["coco_cam"][i], atol=1e-6)
        np.testing.assert_allclose(_pose_to_mat(obj), g["coco_obj"][i], atol=1e-6)


def test_object_index_stream():
    s1 = ReferencePoseSampler(7)
    s2 = np.random.RandomState(7)
    for _ in range(10):
        assert s1.object_index(13) == int(s2.randint(13)) + 1


def test_jax_pose_distribution():
    """jax sampler covers the same support as the reference distribution."""
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    angs, transs = jax.vmap(
        lambda k: random_pose_jax(k, "kitti_v2", 0.15, (0.1, 0.1, 0.1)))(keys)
    angs, transs = np.asarray(angs), np.asarray(transs)
    # translation magnitudes in [base, base+scale]; z always negative (forward)
    assert (np.abs(transs[:, 0]) >= 0.1 - 1e-6).all()
    assert (np.abs(transs[:, 0]) <= 0.2 + 1e-6).all()
    assert (transs[:, 2] < 0).all()
    assert (np.abs(transs[:, 2]) <= 0.25 + 1e-6).all()
    # angles within +-pi/36 * 0.4
    assert (np.abs(angs) <= np.pi / 36 * 0.4 + 1e-6).all()
    # object flavor: halved axes
    angs2, transs2 = jax.vmap(
        lambda k: random_pose_jax(k, "kitti_v2", 0.15, (0.0, 0.0, 0.0)))(keys)
    transs2 = np.asarray(transs2)
    assert (np.abs(transs2) <= 0.5 * np.array([0.1, 0.1, 0.15]) + 1e-6).all()


def test_swing_path():
    poses = gen_swing_path()
    assert poses.shape == (90, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
