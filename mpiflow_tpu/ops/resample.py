"""Bilinear resampling ops with exact torch semantics.

`bilinear_sample_border` reproduces
torch.nn.functional.grid_sample(padding_mode='border', align_corners=False)
as invoked by the reference homography warp (homography_sampler.py:149-156).
The reference's `(x + 0.5) / (0.5 * size) - 1` normalization cancels
align_corners=False denormalization exactly, so the effective semantics are:
sample at the raw pixel coordinate, clamping the coordinate to
[0, size-1] (border padding).

`resize_bilinear_align_corners` reproduces
torch.nn.functional.interpolate(mode='bilinear', align_corners=True)
as used for input resizing (gen_3dphoto_dynamic_v2.py:86-89).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_border(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` [C,H,W] at pixel coordinates `coords` [...,2] ((x,y) order).

    Returns [C, ...]. Border padding: coordinates are clamped into
    [0, W-1] x [0, H-1] before the 4-tap gather (torch border semantics).
    """
    C, H, W = img.shape
    out_shape = coords.shape[:-1]
    x = jnp.clip(coords[..., 0].reshape(-1), 0.0, W - 1.0)
    y = jnp.clip(coords[..., 1].reshape(-1), 0.0, H - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = img.reshape(C, H * W)

    def gather(yi, xi):
        return jnp.take(flat, yi * W + xi, axis=1)  # [C,N]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    w00 = ((1.0 - fy) * (1.0 - fx))[None]
    w01 = ((1.0 - fy) * fx)[None]
    w10 = (fy * (1.0 - fx))[None]
    w11 = (fy * fx)[None]
    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out.reshape((C,) + out_shape)


def resize_bilinear_align_corners(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [C,H,W] -> [C,out_h,out_w], torch bilinear align_corners=True."""
    C, H, W = img.shape
    if (H, W) == (out_h, out_w):
        return img
    # align_corners=True: output pixel i maps to i * (in-1)/(out-1)
    ys = jnp.arange(out_h, dtype=jnp.float32) * ((H - 1) / max(out_h - 1, 1))
    xs = jnp.arange(out_w, dtype=jnp.float32) * ((W - 1) / max(out_w - 1, 1))
    coords = jnp.stack(jnp.meshgrid(xs, ys), axis=-1)  # [out_h,out_w,2] (x,y)
    return bilinear_sample_border(img, coords)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [C,H,W], torch bilinear align_corners=False (half-pixel centers
    with border clamping; F.interpolate's default)."""
    C, H, W = img.shape
    if (H, W) == (out_h, out_w):
        return img
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (H / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (W / out_w) - 0.5
    coords = jnp.stack(jnp.meshgrid(xs, ys), axis=-1)
    return bilinear_sample_border(img, coords)


def avg_pool2d(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """Non-overlapping kxk average pooling on [...,H,W] (torch F.avg_pool2d)."""
    *lead, H, W = x.shape
    x = x.reshape(*lead, H // k, k, W // k, k)
    return x.mean(axis=(-3, -1))


def adaptive_avg_pool2d(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.adaptive_avg_pool2d on [...,H,W]: bin i covers
    [floor(i*H/out), ceil((i+1)*H/out))."""
    *lead, H, W = x.shape
    if H == out_h and W == out_w:
        return x
    if H % out_h == 0 and W % out_w == 0:
        x = x.reshape(*lead, out_h, H // out_h, out_w, W // out_w)
        return x.mean(axis=(-3, -1))
    # general (uneven) bins via cumulative sums; bin i covers
    # [floor(i*n/out), ceil((i+1)*n/out)) as in torch
    import numpy as np

    def pool_axis(arr, out_n, axis):
        n = arr.shape[axis]
        cs = jnp.cumsum(arr, axis=axis)
        zero = jnp.zeros_like(jnp.take(cs, jnp.array([0]), axis=axis))
        cs = jnp.concatenate([zero, cs], axis=axis)
        i = np.arange(out_n)
        starts = (i * n) // out_n
        ends = -((-(i + 1) * n) // out_n)
        hi = jnp.take(cs, jnp.asarray(ends), axis=axis)
        lo = jnp.take(cs, jnp.asarray(starts), axis=axis)
        counts = (ends - starts).astype(np.float32)
        shape = [1] * arr.ndim
        shape[axis % arr.ndim] = -1
        return (hi - lo) / jnp.asarray(counts).reshape(shape)

    x = pool_axis(x, out_h, -2)
    x = pool_axis(x, out_w, -1)
    return x
