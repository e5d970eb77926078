#!/bin/bash
# KITTI-15 train-image dataset generation (reference: scripts/gen_train_kitti15_v2.sh)
python -m mpiflow_tpu.cli.generate \
  --base "${BASE:-data/kitti15_train}" --out "${OUT:-out/kitti15_train}" \
  --width 1280 --height 384 --repeat 5 --seed 114514 --ext_cz 0.15 \
  --flavor kitti_v2 --ckpt_path "${CKPT:-adampiweight/adampi_64p.pth}" "$@"
