from mpiflow_tpu.train.raft_train import (
    sequence_loss, make_optimizer, make_train_step, TrainState, Trainer,
)
from mpiflow_tpu.train.evaluate import (
    validate_kitti, validate_sintel, pad_to_multiple_of_8, epe_f1,
)

__all__ = ["sequence_loss", "make_optimizer", "make_train_step", "TrainState",
           "Trainer", "validate_kitti", "validate_sintel",
           "pad_to_multiple_of_8", "epe_f1"]
