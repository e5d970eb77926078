from mpiflow_tpu.pipeline.generator import DatasetGenerator

__all__ = ["DatasetGenerator"]
