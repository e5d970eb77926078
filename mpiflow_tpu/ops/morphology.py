"""Morphological ops (reference: cv2.dilate 3x3 at moving_obj.py:144-145)."""
from __future__ import annotations

import jax.numpy as jnp


def dilate3x3(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary 3x3 dilation of [H,W] (ones kernel), cv2.dilate-equivalent."""
    x = mask
    for _ in range(iterations):
        p = jnp.pad(x, 1)
        H, W = x.shape
        windows = [p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)]
        x = jnp.stack(windows, 0).max(axis=0)
    return x


def erode3x3(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary 3x3 erosion of [H,W] (constant-pad with 1 outside)."""
    x = mask
    for _ in range(iterations):
        p = jnp.pad(x, 1, constant_values=1)
        H, W = x.shape
        windows = [p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)]
        x = jnp.stack(windows, 0).min(axis=0)
    return x
