#!/bin/bash
# The paper's RAFT fine-tune recipe (reference: RAFT/train_standard.sh):
# 50k steps from raft-things, batch 6, lr 1e-4, crop 288x960, wd 1e-5, g=0.85
python -m mpiflow_tpu.cli.train_raft --name raft-mpi-flow --stage mpi-flow \
  --data_root "${DATA:-out/kitti15_train}" \
  --restore_ckpt "${CKPT:-weights/raft-things.pth}" \
  --num_steps 50000 --batch_size 6 --lr 0.0001 --image_size 288 960 \
  --wdecay 0.00001 --gamma 0.85 --validation kitti "$@"
