"""Parameter-shape manifests for from-scratch RAFT initialization.

Enumerates the torch-keyed parameter dict (HWIO conv layout) matching
mpiflow_tpu.models.raft, so training can start without a torch checkpoint.
Shapes mirror RAFT/core/{extractor,update}.py.
"""
from __future__ import annotations

from typing import Dict, Tuple


def _conv(shapes, name, kh, kw, cin, cout, bias=True):
    shapes[f"{name}.weight"] = (kh, kw, cin, cout)
    if bias:
        shapes[f"{name}.bias"] = (cout,)


def _bn(shapes, name, c):
    shapes[f"{name}.weight"] = (c,)
    shapes[f"{name}.bias"] = (c,)
    shapes[f"{name}.running_mean"] = (c,)
    shapes[f"{name}.running_var"] = (c,)


def _residual_block(shapes, prefix, cin, planes, kind, stride):
    _conv(shapes, f"{prefix}conv1", 3, 3, cin, planes)
    _conv(shapes, f"{prefix}conv2", 3, 3, planes, planes)
    if kind == "batch":
        _bn(shapes, f"{prefix}norm1", planes)
        _bn(shapes, f"{prefix}norm2", planes)
    if stride != 1:
        _conv(shapes, f"{prefix}downsample.0", 1, 1, cin, planes)
        if kind == "batch":
            _bn(shapes, f"{prefix}downsample.1", planes)


def _bottleneck_block(shapes, prefix, cin, planes, kind, stride):
    _conv(shapes, f"{prefix}conv1", 1, 1, cin, planes // 4)
    _conv(shapes, f"{prefix}conv2", 3, 3, planes // 4, planes // 4)
    _conv(shapes, f"{prefix}conv3", 1, 1, planes // 4, planes)
    if kind == "batch":
        _bn(shapes, f"{prefix}norm1", planes // 4)
        _bn(shapes, f"{prefix}norm2", planes // 4)
        _bn(shapes, f"{prefix}norm3", planes)
    if stride != 1:
        _conv(shapes, f"{prefix}downsample.0", 1, 1, cin, planes)
        if kind == "batch":
            _bn(shapes, f"{prefix}downsample.1", planes)


def _encoder(shapes, prefix, kind, output_dim, small):
    stem = 32 if small else 64
    dims = (32, 64, 96) if small else (64, 96, 128)
    block = _bottleneck_block if small else _residual_block
    _conv(shapes, f"{prefix}conv1", 7, 7, 3, stem)
    if kind == "batch":
        _bn(shapes, f"{prefix}norm1", stem)
    cin = stem
    for li, (planes, stride) in enumerate(
            zip((stem,) + dims[1:], (1, 2, 2)), start=1):
        block(shapes, f"{prefix}layer{li}.0.", cin, planes, kind, stride)
        block(shapes, f"{prefix}layer{li}.1.", planes, planes, kind, 1)
        cin = planes
    _conv(shapes, f"{prefix}conv2", 1, 1, cin, output_dim)


def raft_param_shapes(small: bool = False) -> Dict[str, Tuple[int, ...]]:
    shapes: Dict[str, Tuple[int, ...]] = {}
    if small:
        hdim, cdim = 96, 64
        corr_planes = 4 * (2 * 3 + 1) ** 2  # levels * (2r+1)^2, r=3
        _encoder(shapes, "fnet.", "instance", 128, True)
        _encoder(shapes, "cnet.", "none", hdim + cdim, True)
        p = "update_block."
        _conv(shapes, f"{p}encoder.convc1", 1, 1, corr_planes, 96)
        _conv(shapes, f"{p}encoder.convf1", 7, 7, 2, 64)
        _conv(shapes, f"{p}encoder.convf2", 3, 3, 64, 32)
        _conv(shapes, f"{p}encoder.conv", 3, 3, 128, 80)
        gin = hdim + 82 + 64
        for n in ("convz", "convr", "convq"):
            _conv(shapes, f"{p}gru.{n}", 3, 3, gin, hdim)
        _conv(shapes, f"{p}flow_head.conv1", 3, 3, hdim, 128)
        _conv(shapes, f"{p}flow_head.conv2", 3, 3, 128, 2)
        return shapes

    hdim, cdim = 128, 128
    corr_planes = 4 * (2 * 4 + 1) ** 2  # 324
    _encoder(shapes, "fnet.", "instance", 256, False)
    _encoder(shapes, "cnet.", "batch", hdim + cdim, False)
    p = "update_block."
    _conv(shapes, f"{p}encoder.convc1", 1, 1, corr_planes, 256)
    _conv(shapes, f"{p}encoder.convc2", 3, 3, 256, 192)
    _conv(shapes, f"{p}encoder.convf1", 7, 7, 2, 128)
    _conv(shapes, f"{p}encoder.convf2", 3, 3, 128, 64)
    _conv(shapes, f"{p}encoder.conv", 3, 3, 64 + 192, 128 - 2)
    gin = hdim + 128 + cdim  # hidden + motion features + context
    for n in ("convz1", "convr1", "convq1"):
        _conv(shapes, f"{p}gru.{n}", 1, 5, gin, hdim)
    for n in ("convz2", "convr2", "convq2"):
        _conv(shapes, f"{p}gru.{n}", 5, 1, gin, hdim)
    _conv(shapes, f"{p}flow_head.conv1", 3, 3, hdim, 256)
    _conv(shapes, f"{p}flow_head.conv2", 3, 3, 256, 2)
    _conv(shapes, f"{p}mask.0", 3, 3, 128, 256)
    _conv(shapes, f"{p}mask.2", 1, 1, 256, 64 * 9)
    return shapes
