"""On-device hole inpainting.

The reference fills motion-occlusion holes with OpenCV's Navier-Stokes
inpainting on the host (cv2.inpaint(frame, mask, 3, cv2.INPAINT_NS),
utils/utils.py:284-286; TELEA variant at moving_obj.py:162). That is an
iterative PDE solver on CPU -- a per-sample device->host round trip.

`diffusion_inpaint` is the TPU-native equivalent: fixed-iteration Jacobi
relaxation of the Laplace equation over the hole region (the steady state of
NS inpainting is also a smooth harmonic fill). Known pixels are Dirichlet
boundary conditions; iterations run entirely inside jit. Fill masks are
identical to the reference by construction (the mask is an input); filled
values are smooth and visually equivalent rather than bit-equal
(SURVEY.md §7 "cv2.inpaint parity").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighbor_mean(x: jnp.ndarray, m: jnp.ndarray):
    """Mean of available 4-neighbors. x: [H,W,C]; m: [H,W,1] availability."""
    xm = x * m
    pad = lambda a, ph, pw: jnp.pad(a, ((ph, ph), (pw, pw), (0, 0)))
    xs = pad(xm, 1, 1)
    ms = pad(m, 1, 1)
    H, W = x.shape[0], x.shape[1]
    num = (xs[0:H, 1:W + 1] + xs[2:H + 2, 1:W + 1]
           + xs[1:H + 1, 0:W] + xs[1:H + 1, 2:W + 2])
    den = (ms[0:H, 1:W + 1] + ms[2:H + 2, 1:W + 1]
           + ms[1:H + 1, 0:W] + ms[1:H + 1, 2:W + 2])
    return num, den


def diffusion_inpaint(img: jnp.ndarray, hole: jnp.ndarray,
                      num_iters: int = 128) -> jnp.ndarray:
    """Fill `hole` pixels of `img` by harmonic diffusion.

    Args:
      img:  [H,W,C] float image (any range).
      hole: [H,W] bool/int, True where pixels must be synthesized.
      num_iters: Jacobi iterations (static).

    Returns [H,W,C] with holes filled, known pixels untouched (bit-exact).
    """
    hole = hole.astype(jnp.float32)[..., None]          # [H,W,1]
    known = 1.0 - hole
    x0 = img.astype(jnp.float32) * known

    # Initialize holes with a coarse estimate (global mean of known pixels)
    # so large holes converge quickly.
    denom = jnp.maximum(known.sum(), 1.0)
    mean = (x0.sum(axis=(0, 1), keepdims=True) / denom)
    x = x0 + hole * mean

    def body(_, x):
        num, den = _neighbor_mean(x, jnp.ones_like(hole))
        upd = num / jnp.maximum(den, 1.0)
        return known * x0 + hole * upd

    x = jax.lax.fori_loop(0, num_iters, body, x)
    return known * img.astype(jnp.float32) + hole * x


def inpaint_cv2(img_u8, hole_mask, radius: int = 3, method: str = "ns"):
    """Host-side exact-reference inpainting (utils/utils.py:284-286).

    img_u8: [H,W,3] uint8; hole_mask: [H,W] nonzero where holes.
    """
    import cv2
    import numpy as np
    flag = cv2.INPAINT_NS if method == "ns" else cv2.INPAINT_TELEA
    return cv2.inpaint(np.asarray(img_u8), np.asarray(hole_mask, np.uint8),
                       radius, flag)
