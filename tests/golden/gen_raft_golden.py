#!/usr/bin/env python
"""Golden fixture for RAFT: run the reference fork (RAFT/core, pure torch)
on CPU with randomized weights; dump the (key, shape) manifest + outputs.

Usage: python tests/golden/gen_raft_golden.py
"""
import argparse
import os
import sys
import pathlib

import numpy as np
import torch

REFERENCE = os.environ.get("MPIFLOW_REFERENCE", "/root/reference")
OUT = pathlib.Path(__file__).resolve().parent / "data"
OUT.mkdir(parents=True, exist_ok=True)

sys.path.insert(0, os.path.join(REFERENCE, "RAFT", "core"))

from raft import RAFT  # noqa: E402


def randomize_state(model, seed):
    rng = np.random.RandomState(seed)
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or v.ndim == 0:
            new[k] = v
        elif k.endswith("running_var"):
            new[k] = torch.from_numpy(
                (0.5 + rng.rand(*v.shape)).astype(np.float32))
        else:
            new[k] = torch.from_numpy(
                (rng.randn(*v.shape) * 0.05).astype(np.float32))
    model.load_state_dict(new)


def main():
    args = argparse.Namespace(small=False, dropout=0.0, alternate_corr=False,
                              mixed_precision=False)
    model = RAFT(args)
    randomize_state(model, 77)
    model.eval()

    # at tiny sizes the reference NaNs (bilinear_sampler divides by W-1
    # on the 1x1 level-3 corr map); use sizes where all levels are >=2px
    H, W, iters = 128, 160, 4
    rng = np.random.RandomState(3)
    img1 = torch.from_numpy((rng.rand(1, 3, H, W) * 255).astype(np.float32))
    img2 = torch.from_numpy((rng.rand(1, 3, H, W) * 255).astype(np.float32))

    with torch.no_grad():
        preds = model(img1, img2, iters=iters)
        x1 = 2 * (img1 / 255.0) - 1.0
        x2 = 2 * (img2 / 255.0) - 1.0
        fmap1, fmap2 = model.fnet([x1, x2])
        cnet = model.cnet(x1)

    sd_keys, sd_shapes = [], []
    for k, v in model.state_dict().items():
        sd_keys.append(k)
        sd_shapes.append(",".join(map(str, v.shape)))
    np.savez(OUT / "raft.npz",
             img1=img1.numpy(), img2=img2.numpy(),
             preds=np.stack([p.numpy() for p in preds]),
             fmap1=fmap1.numpy(), fmap2=fmap2.numpy(), cnet=cnet.numpy(),
             sd_keys=np.array(sd_keys), sd_shapes=np.array(sd_shapes),
             sd_seed=np.int64(77), sd_scale=np.float64(0.05), iters=np.int64(iters))
    print("raft golden written:",
          (OUT / "raft.npz").stat().st_size // 1024, "KB")


if __name__ == "__main__":
    main()
