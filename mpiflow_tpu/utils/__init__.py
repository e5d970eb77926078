from mpiflow_tpu.utils.profiling import StageTimer, trace_annotation

__all__ = ["StageTimer", "trace_annotation"]
