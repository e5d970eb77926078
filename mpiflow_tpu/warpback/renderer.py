"""RGBD novel-view rendering for the warpback pipeline, TPU-native.

The reference (warpback/utils.py) triangulates the depth map into a
2-faces-per-pixel grid mesh and rasterizes it with pytorch3d's CUDA
rasterizer (rasterize_meshes, faces_per_pixel=1) -- the snapshot's second
native-GPU dependency (SURVEY.md §2.2).

TPU-native equivalent: because the mesh is a *regular grid over the source
image*, rasterizing it equals forward-splatting a sufficiently supersampled
version of the surface with a z-buffer: bilinearly subdividing each quad by
`supersample` reproduces the rasterizer's interpolated coverage (vertex
attributes are interpolated linearly in both). The splat reuses the
sort-based min-z kernel (mpiflow_tpu.ops.forward_warp).

Semantics preserved from the reference:
  * vertices = K^-1 p / (disp + 1e-4)         (construct_mesh, :93-100)
  * per-vertex visibility mask alpha = exp(-10 |sobel(disp)|) > 0.3
    (get_visible_mask, :174-192), interpolated and multiplied into the
    outputs (render*mask, disparity*mask; render_mesh :65-68)
  * output disparity = 1 / (z + 1e-4)         (:67)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mpiflow_tpu.geom.camera import intrinsics_inverse
import jax.ops  # segment ops for the surface splat
from mpiflow_tpu.ops.resample import resize_bilinear

_HI = jax.lax.Precision.HIGHEST
EPS = 1e-4


def visible_mask(disp: jnp.ndarray, beta: float = 10.0,
                 threshold: float = 0.3) -> jnp.ndarray:
    """Sobel-edge visibility (warpback/utils.py:174-192). disp [H,W] -> [H,W]."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    d = disp[None, :, :, None]
    gx = jax.lax.conv_general_dilated(d, kx[:, :, None, None], (1, 1),
                                      ((1, 1), (1, 1)),
                                      dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gy = jax.lax.conv_general_dilated(d, ky[:, :, None, None], (1, 1),
                                      ((1, 1), (1, 1)),
                                      dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mag = jnp.sqrt(gx ** 2 + gy ** 2)[0, :, :, 0]
    return (jnp.exp(-beta * mag) > threshold).astype(jnp.float32)


def rgbd_render(rgb: jnp.ndarray, disp: jnp.ndarray, K_norm: jnp.ndarray,
                cam_ext: jnp.ndarray, supersample: int = 3
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render an RGBD image from a novel view.

    Args:
      rgb: [3,H,W] in [0,1]; disp: [H,W] normalized disparity in [0,1].
      K_norm: [3,3] NORMALIZED intrinsics (as the reference uses,
        stage2_dataset.py:54-58); scaled to pixels internally.
      cam_ext: [3,4] or [4,4] rigid transform to the novel view.
      supersample: mesh-subdivision factor of the splat.

    Returns (render [3,H,W], disparity [H,W], mask [H,W]) with the
    reference's masking applied.
    """
    _, H, W = rgb.shape
    K = K_norm * jnp.asarray([[W], [H], [1.0]], K_norm.dtype)
    R = cam_ext[:3, :3]
    t = cam_ext[:3, 3]

    vis = visible_mask(disp)

    ss = supersample
    Hs, Ws = H * ss, W * ss
    # half-pixel (align_corners=False) lattice: subsample j sits at source
    # coord (j+0.5)/ss - 0.5, the SAME lattice the unprojection below uses,
    # so the center subsample of every pixel carries its exact attributes
    attrs = jnp.concatenate([rgb, vis[None], disp[None]], axis=0)  # [5,H,W]
    attrs_up = resize_bilinear(attrs, Hs, Ws)
    rgb_up = attrs_up[0:3]
    vis_up = attrs_up[3]
    disp_up = attrs_up[4]

    # unproject supersampled pixels: the reference's pixel coords are
    # (i + 0.5)/W normalized (get_screen_pixel_coord :121-139) against the
    # normalized K -- equivalently pixel-space (i + 0.5) against pixel K.
    xs = (jnp.arange(Ws, dtype=jnp.float32) + 0.5) * (W / Ws)
    ys = (jnp.arange(Hs, dtype=jnp.float32) + 0.5) * (H / Hs)
    gx, gy = jnp.meshgrid(xs, ys)
    pix = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(Hs * Ws)], 0)
    depth = 1.0 / (disp_up.ravel() + EPS)
    xyz = jnp.matmul(intrinsics_inverse(K), pix, precision=_HI) * depth[None]
    xyz_t = jnp.matmul(R, xyz, precision=_HI) + t[:, None]
    z = xyz_t[2]

    # project to target pixels (same K)
    proj = jnp.matmul(K, xyz_t, precision=_HI)
    px = proj[0] / jnp.maximum(proj[2], EPS) - 0.5
    py = proj[1] / jnp.maximum(proj[2], EPS) - 0.5
    behind = proj[2] <= EPS
    ix = jnp.round(px).astype(jnp.int32)
    iy = jnp.round(py).astype(jnp.int32)
    oob = behind | (ix < 0) | (ix >= W) | (iy < 0) | (iy >= H)
    # out-of-bounds / behind-camera points splat into a clamped corner with
    # +inf depth so they never win
    ix = jnp.clip(ix, 0, W - 1)
    iy = jnp.clip(iy, 0, H - 1)
    z = jnp.where(oob, jnp.inf, z)

    # surface splat: among samples on the FRONT surface of each target pixel
    # (z within a small band of the pixel's min z), the one landing closest
    # to the pixel center wins -- this matches the rasterizer's behavior of
    # sampling the nearest triangle AT the pixel center, instead of plain
    # min-z (which would pick an arbitrary interpolated sub-sample).
    N = Hs * Ws
    M = H * W
    tgt = (iy * W + ix).astype(jnp.int32)
    zmin = jax.ops.segment_min(z, tgt, num_segments=M)
    counts = jax.ops.segment_sum(jnp.ones((N,), jnp.int32), tgt,
                                 num_segments=M)
    near_front = z <= zmin[tgt] * 1.02 + 1e-3
    dist2 = (px - ix) ** 2 + (py - iy) ** 2
    key = jnp.where(near_front, dist2, jnp.inf)
    dbest = jax.ops.segment_min(key, tgt, num_segments=M)
    pos = jnp.arange(N, dtype=jnp.int32)
    win_pos = jnp.where(near_front & (key <= dbest[tgt]), pos, N)
    winner = jax.ops.segment_min(win_pos, tgt, num_segments=M)
    winner = jnp.clip(winner, 0, N - 1)

    covered = (counts > 0) & jnp.isfinite(zmin)
    rgb_w = rgb_up.reshape(3, -1)[:, winner].reshape(3, H, W)
    vis_w = vis_up.reshape(-1)[winner].reshape(H, W)
    z_w = z[winner].reshape(H, W)

    mask = covered.reshape(H, W).astype(jnp.float32) * vis_w
    render = rgb_w * mask[None]
    disparity = jnp.where(jnp.isfinite(z_w), 1.0 / (z_w + EPS), 0.0) * mask
    return render, disparity, mask
