from mpiflow_tpu.io.flo import (
    read_flo,
    write_flo,
    read_flow_kitti,
    write_flow_kitti,
    read_disp_kitti,
    read_pfm,
    write_pfm,
    read_gen,
    depth_read,
)
from mpiflow_tpu.io.image import (
    load_image,
    load_disparity,
    load_mask,
    save_image_u8,
)
from mpiflow_tpu.io.writer import AsyncSampleWriter, existing_sample_keys

__all__ = [
    "read_flo", "write_flo", "read_flow_kitti", "write_flow_kitti",
    "read_disp_kitti", "read_pfm", "write_pfm", "read_gen", "depth_read",
    "load_image", "load_disparity", "load_mask", "save_image_u8",
    "AsyncSampleWriter", "existing_sample_keys",
]
