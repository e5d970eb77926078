from mpiflow_tpu.warpback.renderer import rgbd_render, visible_mask
from mpiflow_tpu.warpback.datasets import (
    WarpbackStage1, WarpbackStage2, rand_range_tensor,
)

__all__ = ["rgbd_render", "visible_mask", "WarpbackStage1", "WarpbackStage2",
           "rand_range_tensor"]
