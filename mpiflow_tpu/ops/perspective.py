"""Random perspective-flow synthesis and backwarping.

Equivalent of the reference's utils/transform.py experiments (random 3x3
perspective flow :8-41, backwarp :60-111) as jittable ops -- useful for
augmentation-style synthetic flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpiflow_tpu.geom.homography import pixel_grid_homo
from mpiflow_tpu.ops.resample import bilinear_sample_border

_HI = jax.lax.Precision.HIGHEST


def random_perspective_matrix(key: jax.Array, height: int, width: int,
                              shift: float = 0.1) -> jnp.ndarray:
    """A random 3x3 homography displacing the four corners by up to
    `shift` * size (utils/transform.py:8-41 style). Returns [3,3]."""
    corners = jnp.asarray([[0, 0], [width - 1, 0], [0, height - 1],
                           [width - 1, height - 1]], jnp.float32)
    jitter = jax.random.uniform(key, (4, 2), minval=-shift, maxval=shift)
    dst = corners + jitter * jnp.asarray([width, height], jnp.float32)

    # DLT solve for H mapping corners -> dst
    def rows(src, d):
        x, y = src
        u, v = d
        return jnp.asarray([
            [x, y, 1, 0, 0, 0, -u * x, -u * y],
            [0, 0, 0, x, y, 1, -v * x, -v * y]], jnp.float32), jnp.asarray(
                [u, v], jnp.float32)

    A = jnp.concatenate([rows(corners[i], dst[i])[0] for i in range(4)], 0)
    b = jnp.concatenate([rows(corners[i], dst[i])[1] for i in range(4)], 0)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones((1,), jnp.float32)]).reshape(3, 3)


def perspective_flow(H_mat: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Dense flow induced by a homography: [H,W,2]."""
    grid = jnp.asarray(pixel_grid_homo(height, width))
    g = grid.reshape(3, -1)
    t = jnp.matmul(H_mat, g, precision=_HI)
    tgt = t[0:2] / t[2:3]
    return (tgt - g[0:2]).reshape(2, height, width).transpose(1, 2, 0)


def backwarp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp [C,H,W] by flow [H,W,2] (utils/transform.py:60-111
    `warp` semantics with border clamping)."""
    C, H, W = img.shape
    grid = jnp.asarray(pixel_grid_homo(H, W))[0:2].transpose(1, 2, 0)
    return bilinear_sample_border(img, grid + flow)
