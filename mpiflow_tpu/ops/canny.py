"""Canny edge detection in pure JAX (skimage.feature.canny equivalent).

The warpback stage-2 inpainting pipeline computes Canny edges on the host
per-sample (stage2_dataset.py:135-143, canny(gray, sigma=2, mask=...)); this
vectorized version runs inside jit. Steps: Gaussian blur (sigma), Sobel
gradients, 4-direction non-maximum suppression, double-threshold hysteresis
via iterated mask dilation (fixed iteration count). skimage defaults:
low=0.1, high=0.2 on gradient magnitude.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


def _gaussian_kernel(sigma: float):
    radius = int(4 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def _sep_conv(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable 2D filter on [H,W] with edge padding (skimage 'nearest')."""
    r = len(k) // 2
    kj = jnp.asarray(k)
    xp = jnp.pad(x, ((r, r), (0, 0)), mode="edge")
    x = sum(kj[i] * xp[i:i + x.shape[0]] for i in range(len(k)))
    xp = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    x = sum(kj[i] * xp[:, i:i + x.shape[1]] for i in range(len(k)))
    return x


def canny_edges(gray: jnp.ndarray, sigma: float = 2.0,
                low: float = 0.1, high: float = 0.2,
                mask: jnp.ndarray = None,
                hysteresis_iters: int = 32) -> jnp.ndarray:
    """gray [H,W] in [0,1] -> binary edge map [H,W] float 0/1."""
    x = _sep_conv(gray, _gaussian_kernel(sigma))
    # Sobel
    pad = jnp.pad(x, 1, mode="edge")
    H, W = x.shape
    def sh(dy, dx):
        return pad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
    # unnormalized Sobel (skimage/ndimage convention -- its default 0.1/0.2
    # thresholds are calibrated against this scale)
    gx = (sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)
          - sh(-1, -1) - 2 * sh(0, -1) - sh(1, -1))
    gy = (sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
          - sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1))
    mag = jnp.hypot(gx, gy)

    # non-maximum suppression along the quantized gradient direction
    mp = jnp.pad(mag, 1)
    def mg(dy, dx):
        return mp[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
    ang = jnp.arctan2(gy, gx)
    a = (ang % math.pi)
    sector = jnp.floor((a + math.pi / 8) / (math.pi / 4)).astype(jnp.int32) % 4
    n1 = jnp.stack([mg(0, 1), mg(1, 1), mg(1, 0), mg(1, -1)], 0)
    n2 = jnp.stack([mg(0, -1), mg(-1, -1), mg(-1, 0), mg(-1, 1)], 0)
    nb1 = jnp.take_along_axis(n1, sector[None], axis=0)[0]
    nb2 = jnp.take_along_axis(n2, sector[None], axis=0)[0]
    is_max = (mag >= nb1) & (mag >= nb2)

    strong = is_max & (mag > high)
    weak = is_max & (mag > low)
    if mask is not None:
        strong = strong & (mask > 0)
        weak = weak & (mask > 0)

    # hysteresis: grow strong into weak via iterated 3x3 dilation
    def body(_, s):
        sp = jnp.pad(s, 1)
        grown = jnp.stack([sp[dy:dy + H, dx:dx + W]
                           for dy in range(3) for dx in range(3)], 0).max(0)
        return grown & weak | s
    edges = jax.lax.fori_loop(0, hysteresis_iters, body, strong)
    return edges.astype(jnp.float32)
