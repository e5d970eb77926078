from mpiflow_tpu.render.mpi import (
    render_novel_view,
    source_visibility,
    render_source_view,
)
from mpiflow_tpu.render.dynamic import (
    compose_dynamic_pair,
    render_dynamic_sample,
)

__all__ = [
    "render_novel_view", "source_visibility", "render_source_view",
    "compose_dynamic_pair", "render_dynamic_sample",
]
