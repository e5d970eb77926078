from mpiflow_tpu.ops.resample import (
    bilinear_sample_border, resize_bilinear_align_corners, resize_bilinear,
    avg_pool2d, adaptive_avg_pool2d,
)
from mpiflow_tpu.ops.inpaint import diffusion_inpaint, inpaint_cv2
from mpiflow_tpu.ops.morphology import dilate3x3, erode3x3
from mpiflow_tpu.ops.forward_warp import (
    forward_warp_raster, forward_warp_min, WarpResult,
)
from mpiflow_tpu.ops.canny import canny_edges

__all__ = [
    "bilinear_sample_border", "resize_bilinear_align_corners",
    "resize_bilinear", "avg_pool2d", "adaptive_avg_pool2d",
    "diffusion_inpaint", "inpaint_cv2", "dilate3x3", "erode3x3",
    "forward_warp_raster", "forward_warp_min", "WarpResult", "canny_edges",
]
