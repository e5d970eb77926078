"""Disparity sampling utilities for MPI training.

Equivalents of the reference's rendering helpers (utils/mpi/
rendering_utils.py) that are part of the MPI training capability surface
(the inference path uses the fixed linspace, model/AdaMPI.py:64-68):

  * stratified disparity samplers (:46-87)
  * NeRF-style inverse-CDF sampling (:90-139)
  * rounded-index pixel gather + disparity-consistency loss
    (:26-43, mpi_rendering.py:180-210)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def sample_disparity_from_bins(key: jax.Array, batch_size: int,
                               bin_edges: jnp.ndarray) -> jnp.ndarray:
    """Stratified sample inside given descending disparity bin edges
    (rendering_utils.py:46-66). bin_edges [S+1] -> [B,S]."""
    S = bin_edges.shape[0] - 1
    start = bin_edges[:-1][None]
    interval = (bin_edges[1:] - bin_edges[:-1])[None]
    u = jax.random.uniform(key, (batch_size, S), dtype=bin_edges.dtype)
    return start + interval * u


def sample_disparity_linspace(key: jax.Array, batch_size: int, num_bins: int,
                              start: float, end: float) -> jnp.ndarray:
    """Stratified sample over linspace bins (rendering_utils.py:69-87).
    start > end (disparity descending). Returns [B,S]."""
    edges = jnp.linspace(start, end, num_bins + 1)
    interval = edges[1] - edges[0]
    u = jax.random.uniform(key, (batch_size, num_bins))
    return edges[:-1][None] + interval * u


def sample_pdf(key: jax.Array, values: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int) -> jnp.ndarray:
    """Inverse-CDF sampling of a piecewise distribution
    (rendering_utils.py:90-139). values/weights [B,1,N,S] -> [B,1,N,n]."""
    B, _, N, S = weights.shape
    mid = (values[..., 1:] + values[..., :-1]) * 0.5
    bin_edges = jnp.concatenate([values[..., 0:1], mid, values[..., -1:]],
                                axis=-1)                       # [B,1,N,S+1]
    pdf = weights / (weights.sum(-1, keepdims=True) + 1e-5)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    u = jax.random.uniform(key, (B, 1, N, n_samples), dtype=weights.dtype)
    idx = jax.vmap(jax.vmap(jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right"))))(cdf, u)
    lo = jnp.clip(idx - 1, 0, S)
    hi = jnp.clip(idx, 0, S)

    take = lambda a, i: jnp.take_along_axis(a, i, axis=-1)
    cdf_lo, cdf_hi = take(cdf, lo), take(cdf, hi)
    bin_lo, bin_hi = take(bin_edges, lo), take(bin_edges, hi)
    cdf_int = cdf_hi - cdf_lo
    t = (u - cdf_lo) / jnp.maximum(cdf_int, 1e-5)
    t = jnp.where(cdf_int <= 1e-4, 0.5, t)
    return bin_lo + t * (bin_hi - bin_lo)


def gather_pixel_by_pxpy(img: jnp.ndarray, pxpy: jnp.ndarray) -> jnp.ndarray:
    """Rounded-index gather (rendering_utils.py:26-43).
    img [C,H,W]; pxpy [2,N] -> [C,N]."""
    C, H, W = img.shape
    px = jnp.clip(jnp.round(pxpy[0]).astype(jnp.int32), 0, W - 1)
    py = jnp.clip(jnp.round(pxpy[1]).astype(jnp.int32), 0, H - 1)
    return jnp.take(img.reshape(C, -1), py * W + px, axis=1)


def disparity_consistency(grid: jnp.ndarray, K_src_inv: jnp.ndarray,
                          disparity_src: jnp.ndarray, G_tgt_src: jnp.ndarray,
                          K_tgt: jnp.ndarray,
                          disparity_tgt: jnp.ndarray) -> jnp.ndarray:
    """Source->target disparity-consistency loss
    (mpi_rendering.py:180-210). grid [3,H,W]; disparity maps [H,W]."""
    _, H, W = grid.shape
    depth = 1.0 / disparity_src
    xyz = (jnp.matmul(K_src_inv, grid.reshape(3, -1), precision=_HI)
           * depth.reshape(-1)[None])
    R, t = G_tgt_src[:3, :3], G_tgt_src[:3, 3]
    xyz_t = jnp.matmul(R, xyz, precision=_HI) + t[:, None]
    proj = jnp.matmul(K_tgt, xyz_t, precision=_HI)
    pxpy = proj[0:2] / proj[2:3]
    valid = ((pxpy[0] >= 0) & (pxpy[0] <= W - 1)
             & (pxpy[1] >= 0) & (pxpy[1] <= H - 1))
    disp_src_in_tgt = 1.0 / xyz_t[2]
    disp_tgt_at = gather_pixel_by_pxpy(disparity_tgt[None], pxpy)[0]
    diff = jnp.abs(disp_src_in_tgt - disp_tgt_at)
    return (diff * valid).sum() / jnp.maximum(valid.sum(), 1)
