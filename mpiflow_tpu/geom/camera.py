"""Pinhole intrinsics construction and closed-form inversion.

The reference builds K from normalized values scaled by (W, H) in fp16
(gen_3dphoto_dynamic_v2.py:42-49) and inverts it generically in fp64 on the
CPU (utils/utils.py:186-187). For an upper-triangular pinhole K the inverse
is closed-form, so no fp64 round-trip (or any linear solve) is needed.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mpiflow_tpu.config import CameraConfig


def make_intrinsics(width: int, height: int,
                    cam: CameraConfig = CameraConfig(),
                    dtype=np.float32) -> np.ndarray:
    """Build pixel-space K [3,3] from normalized intrinsics.

    With `cam.fp16_quantized`, reproduces the reference's fp16 cast + fp16
    row scaling (gen_3dphoto_dynamic_v2.py:46-49) before upcasting.
    """
    K = np.array([[cam.fx, 0.0, cam.cx],
                  [0.0, cam.fy, cam.cy],
                  [0.0, 0.0, 1.0]], dtype=np.float32)
    if cam.fp16_quantized:
        K = K.astype(np.float16)
        K[0, :] *= np.float16(width)
        K[1, :] *= np.float16(height)
        return K.astype(dtype)
    K[0, :] *= width
    K[1, :] *= height
    return K.astype(dtype)


def scale_intrinsics(K, sx: float, sy: float):
    """Scale K for a resized image (x by sx, y by sy)."""
    K = jnp.asarray(K)
    S = jnp.array([[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]], dtype=K.dtype)
    return K * S


def intrinsics_inverse(K):
    """Closed-form inverse of [[fx,0,cx],[0,fy,cy],[0,0,1]] (batched [...,3,3])."""
    K = jnp.asarray(K)
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    inv = jnp.stack([
        jnp.stack([1.0 / fx, zero, -cx / fx], axis=-1),
        jnp.stack([zero, 1.0 / fy, -cy / fy], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)
    return inv
