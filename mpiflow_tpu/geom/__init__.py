from mpiflow_tpu.geom.se3 import (
    rot_from_axisangle,
    get_translation_matrix,
    transformation_from_parameters,
)
from mpiflow_tpu.geom.camera import (
    make_intrinsics,
    intrinsics_inverse,
    scale_intrinsics,
)
from mpiflow_tpu.geom.homography import (
    pixel_grid_homo,
    plane_homographies,
    homography_grid,
    plane_flow_a2b,
    mpi_plane_disparities,
    src_xyz_from_plane_disparity,
    tgt_xyz_from_plane_disparity,
)

__all__ = [
    "rot_from_axisangle", "get_translation_matrix", "transformation_from_parameters",
    "make_intrinsics", "intrinsics_inverse", "scale_intrinsics",
    "pixel_grid_homo", "plane_homographies", "homography_grid", "plane_flow_a2b",
    "mpi_plane_disparities", "src_xyz_from_plane_disparity",
    "tgt_xyz_from_plane_disparity",
]
