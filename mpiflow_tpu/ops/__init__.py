from mpiflow_tpu.ops.resample import bilinear_sample_border, resize_bilinear_align_corners
from mpiflow_tpu.ops.inpaint import diffusion_inpaint
from mpiflow_tpu.ops.morphology import dilate3x3

__all__ = [
    "bilinear_sample_border", "resize_bilinear_align_corners",
    "diffusion_inpaint", "dilate3x3",
]
