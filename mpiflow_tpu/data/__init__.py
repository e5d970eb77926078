from mpiflow_tpu.data.datasets import (
    FlowPairDataset, MPIFlowPairs, MPIFlowCOCO, KITTIPairs, SintelPairs,
    make_train_iterator, fetch_dataset,
)
from mpiflow_tpu.data.augmentor import FlowAugmentor, SparseFlowAugmentor

__all__ = ["FlowPairDataset", "MPIFlowPairs", "MPIFlowCOCO", "KITTIPairs",
           "SintelPairs", "make_train_iterator", "fetch_dataset",
           "FlowAugmentor", "SparseFlowAugmentor"]
