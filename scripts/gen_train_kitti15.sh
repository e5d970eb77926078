#!/bin/bash
# Legacy-flavor generation (the reference's gen_train_kitti15.sh drives the
# missing gen_3dphoto_dynamic.py -- the v1 pose distribution, exposed here
# as --flavor legacy). One process per accelerator in the reference; here
# one sharded program (--data_parallel) covers the mesh.
python -m mpiflow_tpu.cli.generate \
    --base "${BASE:-dataset/Flow/training/outputs}" \
    --out "${OUT:-dataset/debug}" \
    --flavor legacy --repeat 2 --seed 0 "$@"
