from mpiflow_tpu.models.geometric import geometric_mpi

__all__ = ["geometric_mpi"]
