#!/bin/bash
# Fetch the published torch checkpoints this framework can load directly
# (RAFT/download_models.sh equivalent; convert with cli.convert_ckpt or load
# .pth straight -- models/torch_convert.py handles the layout).
set -e
mkdir -p weights
wget -nc -P weights https://dl.dropboxusercontent.com/s/4j4z58wuv8o0mfz/models.zip
unzip -o weights/models.zip -d weights
echo "AdaMPI weight (adampi_64p.pth) and EdgeConnect weights: see the"
echo "MPI-Flow / AdaMPI release pages; place under adampiweight/ and"
echo "warpback/ecweight/ respectively."
