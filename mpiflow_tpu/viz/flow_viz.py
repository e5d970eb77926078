"""Optical-flow colorization (Middlebury/Baker color wheel).

Same visualization convention as the reference (flow_colors.py:13-118,
utils/flow_viz.py) -- the standard 55-color wheel with radius-normalized
saturation -- provided both as numpy (host viz) and as a vectorized jnp
version usable inside jit for on-device debug montages.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SEGMENTS = (("RY", 15), ("YG", 6), ("GC", 4), ("CB", 11), ("BM", 13), ("MR", 6))


def make_colorwheel() -> np.ndarray:
    """The 55x3 Middlebury color wheel (flow_colors.py:13-58)."""
    ncols = sum(n for _, n in _SEGMENTS)
    wheel = np.zeros((ncols, 3))
    col = 0
    ramps = {
        "RY": (0, None, lambda i, n: (255, np.floor(255 * i / n), 0)),
        "YG": (0, None, lambda i, n: (255 - np.floor(255 * i / n), 255, 0)),
        "GC": (0, None, lambda i, n: (0, 255, np.floor(255 * i / n))),
        "CB": (0, None, lambda i, n: (0, 255 - np.floor(255 * i / n), 255)),
        "BM": (0, None, lambda i, n: (np.floor(255 * i / n), 0, 255)),
        "MR": (0, None, lambda i, n: (255, 0, 255 - np.floor(255 * i / n))),
    }
    for name, n in _SEGMENTS:
        i = np.arange(n)
        r, g, b = ramps[name][2](i, n)
        wheel[col:col + n, 0] = r
        wheel[col:col + n, 1] = g
        wheel[col:col + n, 2] = b
        col += n
    return wheel


def flow_uv_to_colors(u: np.ndarray, v: np.ndarray,
                      convert_to_bgr: bool = False) -> np.ndarray:
    """Color a normalized (|f|<=1 typical) flow field (flow_colors.py:61-94)."""
    wheel = make_colorwheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(u.shape + (3,), np.uint8)
    in_range = rad <= 1
    for c in range(3):
        col0 = wheel[k0, c] / 255.0
        col1 = wheel[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = np.where(in_range, 1 - rad * (1 - col), col * 0.75)
        ch = 2 - c if convert_to_bgr else c
        img[..., ch] = np.floor(255 * col)
    return img


def flow_to_color(flow_uv: np.ndarray, clip_flow=None,
                  convert_to_bgr: bool = False) -> np.ndarray:
    """[H,W,2] flow -> [H,W,3] uint8, max-radius normalized (flow_colors.py:97-118)."""
    if clip_flow is not None:
        flow_uv = np.clip(flow_uv, 0, clip_flow)
    u, v = flow_uv[..., 0], flow_uv[..., 1]
    rad_max = np.sqrt(u ** 2 + v ** 2).max()
    scale = 1.0 / (rad_max + 1e-5)
    return flow_uv_to_colors(u * scale, v * scale, convert_to_bgr)


_WHEEL_J = jnp.asarray(make_colorwheel())


def flow_to_color_jax(flow_uv: jnp.ndarray) -> jnp.ndarray:
    """Jit-friendly flow colorization: [H,W,2] -> [H,W,3] uint8 RGB."""
    u, v = flow_uv[..., 0], flow_uv[..., 1]
    rad = jnp.sqrt(u ** 2 + v ** 2)
    scale = 1.0 / (rad.max() + 1e-5)
    u, v, rad = u * scale, v * scale, rad * scale
    ncols = _WHEEL_J.shape[0]
    a = jnp.arctan2(-v, -u) / jnp.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = jnp.floor(fk).astype(jnp.int32)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]
    col0 = _WHEEL_J[k0] / 255.0
    col1 = _WHEEL_J[k1] / 255.0
    col = (1 - f) * col0 + f * col1
    in_range = (rad <= 1)[..., None]
    col = jnp.where(in_range, 1 - rad[..., None] * (1 - col), col * 0.75)
    return jnp.floor(255 * col).astype(jnp.uint8)
