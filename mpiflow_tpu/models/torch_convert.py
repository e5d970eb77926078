"""Torch checkpoint -> JAX parameter conversion.

Converts the reference's published checkpoints (adampi_64p.pth with keys
{'num_planes','weight'} per gen_3dphoto_dynamic_v2.py:52-58; EdgeConnect
{'generator'} per warpback/networks.py:11-26; RAFT raw state dicts, possibly
nn.DataParallel-prefixed, per RAFT/train.py:141-142) into the flat numpy
dicts consumed by mpiflow_tpu.models.*:

  * Conv2d weights OIHW -> HWIO
  * ConvTranspose2d weights IOHW -> HWOI (name-matched)
  * Linear / norm / 1-D tensors unchanged (Linear kept [out,in])

torch is only needed at conversion time (host-side); converted parameters
can be cached as .npz and loaded without torch.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import numpy as np


def load_torch_checkpoint(path: str) -> dict:
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
        if "__num_planes__" in data:
            return {"num_planes": int(data.pop("__num_planes__")),
                    "weight": data}
        return {"weight": data}
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def convert_state_dict(state_dict,
                       transposed_conv_keys: Iterable[str] = (),
                       strip_prefix: Optional[str] = "module.") -> Dict[str, np.ndarray]:
    """Torch state dict -> flat numpy dict with TPU-native weight layouts."""
    transposed = set(transposed_conv_keys)
    raw = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        if strip_prefix and k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        raw[k] = arr

    # materialize spectral-norm weights (EdgeGenerator, warpback/networks.py
    # :182-185): W = W_orig / sigma with sigma = u . (W_mat v),
    # v = normalize(W_mat^T u) -- torch's eval-mode computation.
    state = {}
    for k, arr in raw.items():
        if k.endswith("weight_orig"):
            base = k[: -len("_orig")]
            u = raw.get(base + "_u")
            if u is not None:
                # torch normalizes along the "output" dim: 0 for Conv2d,
                # 1 for ConvTranspose2d -- infer it from u's length
                dim = 0 if arr.shape[0] == u.shape[0] else 1
                perm = (dim,) + tuple(d for d in range(arr.ndim) if d != dim)
                w_mat = arr.transpose(perm).reshape(arr.shape[dim], -1
                                                    ).astype(np.float64)
                v = raw.get(base + "_v")  # torch eval uses the STORED v
                if v is None:
                    v = w_mat.T @ u.astype(np.float64)
                    v = v / (np.linalg.norm(v) + 1e-12)
                sigma = float(u.astype(np.float64)
                              @ (w_mat @ v.astype(np.float64)))
                state[base] = (arr / sigma).astype(np.float32)
                continue
        if k.endswith("weight_u") or k.endswith("weight_v"):
            continue
        state[k] = arr

    out = {}
    for k, arr in state.items():
        if k.endswith("num_batches_tracked"):
            continue
        if arr.ndim == 4:
            # OIHW->HWIO; for ConvTranspose2d (IOHW) the same permutation
            # yields HWOI, which conv_transpose2d expects.
            arr = arr.transpose(2, 3, 1, 0)
        out[k] = np.ascontiguousarray(arr, dtype=np.float32)
    del transposed  # layout identical for both conv kinds; kept for API clarity
    return out


def save_converted(params: Dict[str, np.ndarray], path: str,
                   num_planes: Optional[int] = None) -> None:
    """Cache converted params as .npz (loadable without torch)."""
    data = dict(params)
    if num_planes is not None:
        data["__num_planes__"] = np.int64(num_planes)
    np.savez(path, **data)
