#!/bin/bash
# Upstream RAFT's full C -> T -> S -> K curriculum (RAFT/train_mixed.sh),
# driven through the TPU trainer. DATA must contain FlyingChairs_release/,
# FlyingThings3D/, Sintel/, KITTI/, HD1K/ (the reference's datasets/ layout).
set -e
DATA=${DATA:-datasets}
mkdir -p checkpoints
python -m mpiflow_tpu.cli.train_raft --name raft-chairs --stage chairs \
    --data_root "$DATA/FlyingChairs_release" --num_steps 120000 \
    --batch_size 8 --lr 0.00025 --image_size 368 496 --wdecay 0.0001 \
    --mixed_precision
python -m mpiflow_tpu.cli.train_raft --name raft-things --stage things \
    --data_root "$DATA/FlyingThings3D" \
    --restore_ckpt checkpoints/raft-chairs.npz --num_steps 120000 \
    --batch_size 5 --lr 0.0001 --image_size 400 720 --wdecay 0.0001 \
    --mixed_precision
python -m mpiflow_tpu.cli.train_raft --name raft-sintel --stage sintel \
    --data_root "$DATA" --restore_ckpt checkpoints/raft-things.npz \
    --num_steps 120000 --batch_size 5 --lr 0.0001 --image_size 368 768 \
    --wdecay 0.00001 --gamma 0.85 --mixed_precision
python -m mpiflow_tpu.cli.train_raft --name raft-kitti --stage kitti \
    --data_root "$DATA/KITTI" --restore_ckpt checkpoints/raft-sintel.npz \
    --num_steps 50000 --batch_size 5 --lr 0.0001 --image_size 288 960 \
    --wdecay 0.00001 --gamma 0.85 --mixed_precision
