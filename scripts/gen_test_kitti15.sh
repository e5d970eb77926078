#!/bin/bash
# KITTI-15 test-image dataset generation (reference: scripts/gen_test_kitti15.sh)
python -m mpiflow_tpu.cli.generate \
  --base "${BASE:-data/kitti15_test}" --out "${OUT:-out/kitti15_test}" \
  --width 1280 --height 384 --repeat 5 --seed 114514 --ext_cz 0.15 \
  --flavor kitti_v2 --ckpt_path "${CKPT:-adampiweight/adampi_64p.pth}" "$@"
