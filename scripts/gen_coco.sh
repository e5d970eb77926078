#!/bin/bash
# COCO dataset generation (reference: scripts/gen_coco.sh; the reference
# sharded by CUDA_VISIBLE_DEVICES -- here one process drives the TPU mesh)
python -m mpiflow_tpu.cli.generate \
  --base "${BASE:-data/coco}" --out "${OUT:-out/coco}" \
  --width 640 --height 384 --repeat 4 --seed 114514 \
  --flavor coco --ckpt_path "${CKPT:-adampiweight/adampi_64p.pth}" "$@"
