#!/bin/bash
# Sustained online-training run at the documented product shape
# (docs/ONLINE.md): 24 scenes 384x1280, 64-plane adampi_random, full RAFT,
# batch 6, 288x960 crop, 12 GRU iters, gen every 4 steps, buffer 600,
# 2000 steps. --val_freq 500 keeps the run OOM-survivable (round-3
# lesson: do NOT run the test suite concurrently on this host).
cd "$(dirname "$0")/.."
mkdir -p logs
exec timeout 21600 python -m mpiflow_tpu.cli.train_online \
  --base data/online_base --width 1280 --height 384 --planes 64 \
  --predictor adampi_random --flavor kitti_v2 --repeat 5 \
  --num_steps 2000 --batch_size 6 --image_size 288 960 --iters 12 \
  --buffer 600 --gen_every 4 --val_freq 500 --remat_gru --name online_r4 \
  --checkpoint_dir runs/online_r4/ckpt --run_dir runs/online_r4 "$@"
