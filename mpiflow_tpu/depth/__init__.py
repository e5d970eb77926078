from mpiflow_tpu.depth.bilateral import (
    sparse_bilateral_filter, depth_discontinuity,
)

__all__ = ["sparse_bilateral_filter", "depth_discontinuity"]
