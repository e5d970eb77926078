from mpiflow_tpu.models.geometric import geometric_mpi

__all__ = ["geometric_mpi"]

# heavier model modules are imported lazily by their users:
#   mpiflow_tpu.models.adampi       AdaMPI (CPN + PAN) inference
#   mpiflow_tpu.models.raft         RAFT optical flow
#   mpiflow_tpu.models.edgeconnect  EdgeConnect inpainters
#   mpiflow_tpu.models.torch_convert  torch checkpoint conversion
