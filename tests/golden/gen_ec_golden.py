#!/usr/bin/env python
"""Golden fixture for the EdgeConnect generators: run the reference nets
(warpback/networks.py, pure torch) on CPU with randomized weights and dump
the state dict + input/output pairs. Exercises spectral-norm conversion.

Usage: python tests/golden/gen_ec_golden.py
"""
import os
import sys
import pathlib

import numpy as np
import torch

REFERENCE = os.environ.get("MPIFLOW_REFERENCE", "/root/reference")
OUT = pathlib.Path(__file__).resolve().parent / "data"
sys.path.insert(0, REFERENCE)

from warpback.networks import InpaintGenerator, EdgeGenerator  # noqa: E402


def randomize(model, seed):
    rng = np.random.RandomState(seed)
    new = {}
    for k, v in model.state_dict().items():
        if v.ndim == 0 or k.endswith("weight_u") or k.endswith("weight_v"):
            new[k] = v  # keep spectral-norm power-iteration vectors
        else:
            new[k] = torch.from_numpy(
                (rng.randn(*v.shape) * 0.05).astype(np.float32))
    model.load_state_dict(new)


def main():
    torch.manual_seed(0)
    H, W = 64, 96
    rng = np.random.RandomState(7)

    inpaint = InpaintGenerator()          # 4 -> 3
    randomize(inpaint, 11)
    inpaint.eval()
    x_inp = torch.from_numpy(rng.rand(1, 4, H, W).astype(np.float32))
    with torch.no_grad():
        y_inp = inpaint(x_inp)

    edge = EdgeGenerator()                # 3 -> 1, spectral norm
    randomize(edge, 12)
    edge.eval()
    x_edge = torch.from_numpy(rng.rand(1, 3, H, W).astype(np.float32))
    with torch.no_grad():
        y_edge = edge(x_edge)

    def manifest(model):
        ks, shapes = [], []
        for k, v in model.state_dict().items():
            ks.append(k)
            shapes.append(",".join(map(str, v.shape)))
        return np.array(ks), np.array(shapes)

    ik, ish = manifest(inpaint)
    ek, esh = manifest(edge)
    # spectral-norm u/v vectors are random-initialized by torch (not by our
    # manifest RNG), so store them verbatim
    ec_uv = {f"uv.{k}": v.numpy() for k, v in edge.state_dict().items()
             if k.endswith("weight_u") or k.endswith("weight_v")}
    np.savez(OUT / "edgeconnect.npz",
             x_inp=x_inp.numpy(), y_inp=y_inp.numpy(),
             x_edge=x_edge.numpy(), y_edge=y_edge.numpy(),
             inp_keys=ik, inp_shapes=ish, inp_seed=np.int64(11),
             edge_keys=ek, edge_shapes=esh, edge_seed=np.int64(12),
             **ec_uv)
    print("edgeconnect golden written:",
          (OUT / "edgeconnect.npz").stat().st_size // 1024, "KB")


if __name__ == "__main__":
    main()
