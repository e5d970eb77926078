"""Fused MPI novel-view rendering: the north-star hot path.

Reference pipeline per novel view (utils/utils.py:291-349 +
utils/mpi/mpi_rendering.py:259-349 + utils/mpi/homography_sampler.py):

  1. per-plane homography warp of an (rgb, sigma, xyz_tgt, obj_mask) stack
     into the target frame -- materializes a (S,8,H,W) tensor and runs two
     grid_sample passes over it;
  2. sigma->alpha conversion with inter-plane euclidean distances, exclusive
     cumulative transmittance, weighted sums (mpi_rendering.py:62-99);
  3. a second compositing pass with *source*-frame weights for the flow
     (mpi_rendering.py:102-139);
  4. source-view visibility blending of the original image into the MPI
     (utils/utils.py:195-204).

This module fuses all four into ONE `lax.scan` over planes: per step it
computes the plane homography coordinates, gathers 8 channels bilinearly,
and updates running transmittances / weighted sums. Peak memory is O(H*W)
instead of O(S*H*W); XLA fuses each step's gather + elementwise chain.
Numerics match the reference bit-for-bit in fp32 (the reference's exclusive
cumprod(T + 1e-6), the 1e3 far-plane distance cap, the z<0 sigma mask, and
the border-clamped bilinear sampling are all reproduced exactly).

All functions are single-sample; batch with vmap over (pose, image).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mpiflow_tpu.geom.camera import intrinsics_inverse
from mpiflow_tpu.geom.homography import pixel_grid_homo, plane_homographies
from mpiflow_tpu.ops.resample import bilinear_sample_border

_HI = jax.lax.Precision.HIGHEST

# Gather from per-plane dynamic-slice scan inputs (False, default) vs. from
# the flat [S*Nb, rowC] plane stack with per-plane row offsets (True).
# Measured on v5e: the per-plane slice regime is ~10x faster -- XLA places
# the 22MB plane slice where the gather has locality, while random-access
# gathers over the full GB-scale table are HBM-latency bound (bench.py:
# 2.479 vs 0.253 pairs/s). Kept as a probe knob for future toolchains.
_FLAT_GATHER = False


class NovelView(NamedTuple):
    frame: jnp.ndarray        # [3,H,W] composited target rgb
    depth: jnp.ndarray        # [H,W] composited target depth
    flow: jnp.ndarray         # [2,H,W] source->target flow (src-frame weights)
    obj_mask: jnp.ndarray     # [H,W] composited warped object mask
    valid_sum: jnp.ndarray    # [H,W] number of planes landing in-bounds


def _plane_distances_src(disparities: jnp.ndarray, ray_norm: jnp.ndarray,
                         far_cap: float):
    """Source-frame inter-plane distances, analytically.

    ||xyz_{s+1} - xyz_s|| = ||K^-1 p|| * (depth_{s+1} - depth_s) since
    xyz_s = (K^-1 p) * depth_s (mpi_rendering.py:68-78). The last plane gets
    the constant far cap. Returns [S,H,W].
    """
    depths = 1.0 / disparities
    delta = depths[1:] - depths[:-1]                      # [S-1]
    dist = delta[:, None, None] * ray_norm[None]          # [S-1,H,W]
    last = jnp.full((1,) + ray_norm.shape, far_cap, dist.dtype)
    return jnp.concatenate([dist, last], axis=0)


def source_visibility(mpi_sigma: jnp.ndarray, disparities: jnp.ndarray,
                      K_src: jnp.ndarray, cumprod_eps: float = 1e-6,
                      far_cap: float = 1e3) -> jnp.ndarray:
    """Exclusive accumulated transmittance of the source-view render.

    Equals `blend_weights` in the reference (utils/utils.py:195-201, i.e.
    transparency_acc of mpi_rendering.render at the source pose).
    mpi_sigma: [S,1,H,W] -> returns [S,1,H,W].
    """
    S, _, H, W = mpi_sigma.shape
    grid = jnp.asarray(pixel_grid_homo(H, W))
    rays = jnp.matmul(intrinsics_inverse(K_src), grid.reshape(3, -1),
                      precision=_HI).reshape(3, H, W)
    ray_norm = jnp.linalg.norm(rays, axis=0)
    dist = _plane_distances_src(disparities, ray_norm, far_cap)  # [S,H,W]
    T = jnp.exp(-mpi_sigma[:, 0] * dist)                          # [S,H,W]
    T_acc = jnp.cumprod(T + cumprod_eps, axis=0)
    T_acc = jnp.concatenate([jnp.ones((1, H, W), T.dtype), T_acc[:-1]], axis=0)
    return T_acc[:, None]


def render_source_view(mpi_rgb: jnp.ndarray, mpi_sigma: jnp.ndarray,
                       disparities: jnp.ndarray, K_src: jnp.ndarray,
                       cumprod_eps: float = 1e-6, far_cap: float = 1e3,
                       depth_eps: float = 1e-5):
    """Composite the MPI at the source pose (mpi_rendering.render, identity G).

    Returns (rgb [3,H,W], depth [H,W], blend_weights [S,1,H,W]).
    """
    S, _, H, W = mpi_sigma.shape
    grid = jnp.asarray(pixel_grid_homo(H, W))
    rays = jnp.matmul(intrinsics_inverse(K_src), grid.reshape(3, -1),
                      precision=_HI).reshape(3, H, W)
    ray_norm = jnp.linalg.norm(rays, axis=0)
    dist = _plane_distances_src(disparities, ray_norm, far_cap)
    T = jnp.exp(-mpi_sigma[:, 0] * dist)
    T_acc = jnp.cumprod(T + cumprod_eps, axis=0)
    T_acc = jnp.concatenate([jnp.ones((1, H, W), T.dtype), T_acc[:-1]], axis=0)
    w = T_acc * (1.0 - T)                                  # [S,H,W]
    rgb = (w[:, None] * mpi_rgb).sum(0)
    z = rays[2][None] * (1.0 / disparities)[:, None, None]  # [S,H,W] plane z
    depth = (w * z).sum(0) / (w.sum(0) + depth_eps)
    return rgb, depth, T_acc[:, None]


def render_novel_view(mpi_rgb: jnp.ndarray,
                      mpi_sigma: jnp.ndarray,
                      disparities: jnp.ndarray,
                      G_tgt_src: jnp.ndarray,
                      K_src: jnp.ndarray,
                      K_tgt: jnp.ndarray,
                      src_img: Optional[jnp.ndarray] = None,
                      obj_mask: Optional[jnp.ndarray] = None,
                      flow_clip: float = 200.0,
                      cumprod_eps: float = 1e-6,
                      far_cap: float = 1e3,
                      depth_eps: float = 1e-5,
                      hard_flow: bool = False,
                      mode: str = "scan") -> NovelView:
    """Render the MPI at a novel pose; fused equivalent of
    utils/utils.py:291-349 (render_novel_view_dynamic).

    mode:
      * "scan":    one lax.scan over planes, O(H*W) live memory (the
                   HBM-lean path; plane count scales freely).
      * "batched": all planes warped in one batched gather, compositing via
                   vectorized cumulative products. Materializes the
                   (S,8,H,W) warped stack (~1GB fp32 at KITTI res) but
                   issues ONE large gather instead of S serial ones --
                   faster when per-gather latency dominates. Numerics
                   identical (shared golden tests).

    Args:
      mpi_rgb:   [S,3,H,W] plane colors (raw MPI; source blending is fused
                 in when `src_img` is given, matching utils/utils.py:202-204).
      mpi_sigma: [S,1,H,W] plane densities.
      disparities: [S] plane disparities (descending near->far).
      G_tgt_src: [4,4] source->target rigid transform.
      K_src/K_tgt: [3,3] intrinsics.
      src_img:   optional [3,H,W]; when given, each plane's rgb becomes
                 w*src + (1-w)*rgb with w = source visibility.
      obj_mask:  optional [H,W] object mask tracked through the warp.
      hard_flow: argmax-plane flow instead of the weighted sum
                 (mpi_rendering.py:126-130).
    """
    S, _, H, W = mpi_rgb.shape
    dtype = mpi_rgb.dtype
    grid = jnp.asarray(pixel_grid_homo(H, W), dtype)
    grid_flat = grid.reshape(3, -1)

    K_src_inv = intrinsics_inverse(K_src)
    rays = jnp.matmul(K_src_inv, grid_flat, precision=_HI)   # [3,HW]
    ray_norm = jnp.linalg.norm(rays, axis=0).reshape(H, W)
    depths = 1.0 / disparities                               # [S]
    R = G_tgt_src[:3, :3]
    t = G_tgt_src[:3, 3]
    # xyz_tgt_s = R (rays d_s) + t -- evaluated per plane inside the scan
    Rrays = jnp.matmul(R, rays, precision=_HI)               # [3,HW]

    H_ts, H_st = plane_homographies(G_tgt_src, K_src, K_tgt, depths)

    # per-plane source-frame sigma distances (analytic; [S] scalars x raymap)
    delta = jnp.concatenate([depths[1:] - depths[:-1],
                             jnp.zeros((1,), dtype)])        # last unused
    is_last = jnp.arange(S) == S - 1

    obj = obj_mask if obj_mask is not None else jnp.zeros((H, W), dtype)
    has_src = src_img is not None
    src = src_img if has_src else jnp.zeros((3, H, W), dtype)

    # --- shared source-frame quantities (both modes) -------------------
    # source sigma distances: ray_norm * delta_depth, far cap on the last
    dist_src_all = jnp.concatenate(
        [(depths[1:] - depths[:-1])[:, None, None] * ray_norm[None],
         jnp.full((1, H, W), far_cap, dtype)], axis=0)          # [S,H,W]

    if mode == "batched":
        return _render_batched(
            mpi_rgb, mpi_sigma, dist_src_all, H_ts, H_st, depths, R, t,
            K_src_inv, grid_flat, obj, has_src, src, flow_clip, cumprod_eps,
            far_cap, depth_eps, hard_flow)

    zeros_hw = jnp.zeros((H, W), dtype)

    K_inv = intrinsics_inverse(K_src)

    def warped_xyz_analytic(coords, depth_s):
        """Warped xyz_tgt WITHOUT a gather: xyz_tgt is linear in source
        pixel coords, and border-clamped bilinear sampling of a linear
        function equals evaluating it at the clamped sample coordinate, so
        warp(xyz_tgt)(p) = R K^-1 (x_c, y_c, 1) d_s + t exactly."""
        xc = jnp.clip(coords[0], 0.0, W - 1.0)
        yc = jnp.clip(coords[1], 0.0, H - 1.0)
        v = jnp.stack([xc.ravel(), yc.ravel(), jnp.ones(H * W, dtype)])
        xyz = jnp.matmul(R, jnp.matmul(K_inv, v, precision=_HI),
                         precision=_HI) * depth_s + t[:, None]
        return xyz.reshape(3, H, W)

    def warp_plane(s_idx, H_ts_s, H_st_s, depth_s, blend_w):
        """Gather one plane's 5-channel stack into the target frame; the
        xyz channels are reconstructed analytically (see above).

        blend_w is the source visibility T_src_acc at this plane: the plane
        rgb is blended with the original image in the SOURCE frame before
        warping (utils/utils.py:202-204), fused here via the scan carry.
        """
        src_homo = jnp.matmul(H_st_s, grid_flat, precision=_HI)   # [3,HW]
        coords = (src_homo[0:2] / src_homo[2:3]).reshape(2, H, W)
        valid = ((coords[0] < W) & (coords[0] > -1)
                 & (coords[1] < H) & (coords[1] > -1)).astype(dtype)
        rgb_s = mpi_rgb[s_idx]
        if has_src:
            rgb_s = blend_w[None] * src + (1.0 - blend_w[None]) * rgb_s
        sigma_s = mpi_sigma[s_idx, 0]
        stack = jnp.concatenate(
            [rgb_s, sigma_s[None], obj[None]], axis=0)            # [5,H,W]
        # blocked layout: ONE gathered row per pixel instead of four (XLA
        # TPU gathers are index-rate bound; see ops/resample.py)
        from mpiflow_tpu.ops.resample import (blocked_source,
                                              bilinear_sample_blocked)
        warped5 = bilinear_sample_blocked(blocked_source(stack), 5, H, W,
                                          coords.transpose(1, 2, 0))
        xyz_w = warped_xyz_analytic(coords, depth_s)
        warped = jnp.concatenate(
            [warped5[0:4], xyz_w, warped5[4:5]], axis=0)          # [8,H,W]
        # flowA2B_s: source grid through H_tgt_src minus grid
        tgt_homo = jnp.matmul(H_ts_s, grid_flat, precision=_HI)
        flow_s = ((tgt_homo[0:2] / tgt_homo[2:3]) - grid_flat[0:2]
                  ).reshape(2, H, W)
        return warped, valid, flow_s

    def composite_prev(carry_T_tgt, w_sum, accs, prev, dist_tgt):
        """Composite the previously-warped plane with tgt-frame weights."""
        rgb_p, sigma_p, z_p, obj_p = prev
        T_p = jnp.exp(-sigma_p * dist_tgt)
        alpha_p = 1.0 - T_p
        w = carry_T_tgt * alpha_p
        rgb_acc, z_acc, obj_acc = accs
        rgb_acc = rgb_acc + w[None] * rgb_p
        z_acc = z_acc + w * z_p
        obj_acc = obj_acc + w * obj_p
        carry_T_tgt = carry_T_tgt * (T_p + cumprod_eps)
        return carry_T_tgt, w_sum + w, (rgb_acc, z_acc, obj_acc)

    def step(carry, xs):
        (T_src_acc, T_tgt_acc, w_sum, rgb_acc, z_acc, obj_acc, flow_acc,
         valid_acc, wmax, flow_at_max, prev_rgb, prev_sigma, prev_xyz,
         prev_obj) = carry
        s_idx, H_ts_s, H_st_s, depth_s, delta_s, last_s = xs

        warped, valid_s, flow_s = warp_plane(s_idx, H_ts_s, H_st_s, depth_s,
                                             T_src_acc)
        rgb_w = warped[0:3]
        sigma_w = warped[3]
        xyz_w = warped[4:7]
        obj_w = warped[7]
        # zero sigma where warped z < 0 (mpi_rendering.py:335-338)
        sigma_w = jnp.where(xyz_w[2] >= 0, sigma_w, 0.0)

        # ---- source-frame side (flow weights + rgb blending) ----
        sigma_src_s = mpi_sigma[s_idx, 0]
        dist_src = jnp.where(last_s, jnp.full_like(ray_norm, far_cap),
                             ray_norm * delta_s)
        T_src = jnp.exp(-sigma_src_s * dist_src)
        w_src = T_src_acc * (1.0 - T_src)
        flow_acc = flow_acc + w_src[None] * flow_s
        take = w_src > wmax
        wmax = jnp.where(take, w_src, wmax)
        flow_at_max = jnp.where(take[None], flow_s, flow_at_max)
        T_src_acc = T_src_acc * (T_src + cumprod_eps)

        # ---- target-frame compositing of the PREVIOUS plane ----
        is_first = s_idx == 0
        dist_tgt = jnp.linalg.norm(xyz_w - prev_xyz, axis=0)
        T_p = jnp.exp(-prev_sigma * dist_tgt)
        alpha_p = 1.0 - T_p
        w = jnp.where(is_first, zeros_hw, T_tgt_acc * alpha_p)
        rgb_acc = rgb_acc + w[None] * prev_rgb
        z_acc = z_acc + w * prev_xyz[2]
        obj_acc = obj_acc + w * prev_obj
        w_sum = w_sum + w
        T_tgt_acc = jnp.where(is_first, T_tgt_acc,
                              T_tgt_acc * (T_p + cumprod_eps))

        valid_acc = valid_acc + valid_s
        carry = (T_src_acc, T_tgt_acc, w_sum, rgb_acc, z_acc, obj_acc,
                 flow_acc, valid_acc, wmax, flow_at_max,
                 rgb_w, sigma_w, xyz_w, obj_w)
        return carry, None

    init = (jnp.ones((H, W), dtype), jnp.ones((H, W), dtype), zeros_hw,
            jnp.zeros((3, H, W), dtype), zeros_hw, zeros_hw,
            jnp.zeros((2, H, W), dtype), zeros_hw,
            jnp.full((H, W), -jnp.inf, dtype), jnp.zeros((2, H, W), dtype),
            jnp.zeros((3, H, W), dtype), zeros_hw,
            jnp.zeros((3, H, W), dtype), zeros_hw)

    xs = (jnp.arange(S), H_ts, H_st, depths, delta, is_last)
    carry, _ = jax.lax.scan(step, init, xs)
    (T_src_acc, T_tgt_acc, w_sum, rgb_acc, z_acc, obj_acc, flow_acc,
     valid_acc, wmax, flow_at_max, prev_rgb, prev_sigma, prev_xyz,
     prev_obj) = carry

    # final (farthest) plane composited with the constant far-distance cap
    dist_last = jnp.full((H, W), far_cap, dtype)
    T_p = jnp.exp(-prev_sigma * dist_last)
    w = T_tgt_acc * (1.0 - T_p)
    rgb_acc = rgb_acc + w[None] * prev_rgb
    z_acc = z_acc + w * prev_xyz[2]
    obj_acc = obj_acc + w * prev_obj
    w_sum = w_sum + w

    depth = z_acc / (w_sum + depth_eps)
    flow = flow_at_max if hard_flow else flow_acc
    flow = jnp.clip(flow, -flow_clip, flow_clip)
    return NovelView(frame=rgb_acc, depth=depth, flow=flow,
                     obj_mask=obj_acc, valid_sum=valid_acc)


class PreblockedMPI(NamedTuple):
    """Pose-independent render inputs, shared by the two dynamic renders.

    The per-plane blended rgb, sigma and tiled object mask in the blocked
    gather layout (ops/resample.blocked_source), plus the precomputed
    source-frame flow weights. Building this once per (image, repeat) pulls
    ~70% of the render cost out of the per-pose scans (the in-scan layout
    build was 6.4ms/plane; vectorized over planes it is ~0.5ms/plane).
    """
    blocked: jnp.ndarray       # [S, Hb*Wb, halo^2*5] ([S,45,Hb,Wb] if pallas)
    w_src: jnp.ndarray         # [S,H,W] source-frame compositing weights
    mpi_sigma: jnp.ndarray     # [S,1,H,W] (for parity APIs)
    height: int
    width: int
    halo: int = 3
    pallas: bool = False       # blocked holds the pallas table layout


def preblock_mpi(mpi_rgb: jnp.ndarray, mpi_sigma: jnp.ndarray,
                 disparities: jnp.ndarray, K_src: jnp.ndarray,
                 src_img: Optional[jnp.ndarray] = None,
                 obj_mask: Optional[jnp.ndarray] = None,
                 cumprod_eps: float = 1e-6,
                 far_cap: float = 1e3, halo: int = 3,
                 pallas: bool = False,
                 warp_dtype=None) -> PreblockedMPI:
    """Precompute the pose-independent half of render_novel_view.

    halo=5 enables the quad (one-gather-per-2x2-tile) render path in
    render_novel_view_preblocked at 25/9 the layout memory; requires even
    H,W (auto-downgraded to halo=3 otherwise). pallas=True builds the
    [S,9C,Hb,Wb] table layout for the Pallas warp kernel
    (ops/pallas_warp.py; auto-downgraded when the shape is unsupported)."""
    from mpiflow_tpu.ops.resample import blocked_source
    S, _, H, W = mpi_rgb.shape
    dtype = mpi_rgb.dtype
    grid = jnp.asarray(pixel_grid_homo(H, W), dtype)
    rays = jnp.matmul(intrinsics_inverse(K_src), grid.reshape(3, -1),
                      precision=_HI)
    ray_norm = jnp.linalg.norm(rays, axis=0).reshape(H, W)
    depths = 1.0 / disparities
    dist_src = jnp.concatenate(
        [(depths[1:] - depths[:-1])[:, None, None] * ray_norm[None],
         jnp.full((1, H, W), far_cap, dtype)], axis=0)        # [S,H,W]

    T_src = jnp.exp(-mpi_sigma[:, 0] * dist_src)
    T_acc = jnp.cumprod(T_src + cumprod_eps, axis=0)
    T_acc = jnp.concatenate([jnp.ones((1, H, W), dtype), T_acc[:-1]], axis=0)
    w_src = T_acc * (1.0 - T_src)

    rgb = mpi_rgb
    if src_img is not None:
        rgb = T_acc[:, None] * src_img[None] + (1 - T_acc[:, None]) * rgb
    obj = obj_mask if obj_mask is not None else jnp.zeros((H, W), dtype)
    stack = jnp.concatenate(
        [rgb, mpi_sigma, jnp.broadcast_to(obj[None, None], (S, 1, H, W))],
        axis=1)                                               # [S,5,H,W]
    # NOTE a barrier here (materializing the stack before the layout
    # transform) makes preblock 2.5x faster STANDALONE (XLA otherwise
    # fuses the blend math into all nine tap reads, recomputing it ~9x)
    # but 15% SLOWER inside the full fused sample pipeline, where the
    # recompute overlaps the gather-bound renders for free while the
    # barrier forces a serialization point -- measured both ways on v5e
    # (tools/bench_render_breakdown.py vs bench.py); keep the fusion.
    if warp_dtype is not None:
        # bf16 tables halve the HBM traffic of the bytes-bound warp; flow
        # stays exact (analytic coords + f32 w_src), see RenderConfig
        stack = stack.astype(warp_dtype)
    if pallas:
        from mpiflow_tpu.ops.pallas_warp import (ky_for_dtype,
                                                 supported_shape,
                                                 table_from_image)
        if supported_shape(H, W, ky_for_dtype(stack.dtype)):
            blocked = jax.vmap(table_from_image)(stack)   # [S,45,Hb,Wb]
            return PreblockedMPI(blocked=blocked, w_src=w_src,
                                 mpi_sigma=mpi_sigma, height=H, width=W,
                                 pallas=True)
    if halo == 5 and (H % 2 or W % 2):
        halo = 3
    blocked = jax.vmap(lambda s: blocked_source(s, halo))(stack)
    return PreblockedMPI(blocked=blocked, w_src=w_src, mpi_sigma=mpi_sigma,
                         height=H, width=W, halo=halo)


def render_novel_view_preblocked(pre: PreblockedMPI,
                                 disparities: jnp.ndarray,
                                 G_tgt_src: jnp.ndarray,
                                 K_src: jnp.ndarray, K_tgt: jnp.ndarray,
                                 flow_clip: float = 200.0,
                                 cumprod_eps: float = 1e-6,
                                 far_cap: float = 1e3,
                                 depth_eps: float = 1e-5,
                                 hard_flow: bool = False,
                                 invert_mask: bool = False) -> NovelView:
    """Pose-specific half: scan over planes with one gather per plane.
    Numerics identical to render_novel_view(mode='scan') (golden-tested).

    invert_mask composites the COMPLEMENT of the tracked mask: bilinear
    warping is affine, so warp(1-m) = 1-warp(m) and the composite is
    exactly w_sum - obj_acc.

    With a halo=5 preblock (see preblock_mpi) the gather runs one index per
    2x2 OUTPUT tile (4x fewer indices on the index-rate-bound TPU gather)
    whenever every plane warp's local stretch is <= ~2px/px -- checked at
    runtime (tile2_spread_ok) with a lax.cond falling back to the exact
    per-pixel path, so numerics are identical for ANY pose."""
    from mpiflow_tpu.ops.resample import (bilinear_sample_blocked,
                                          bilinear_sample_blocked_tile2,
                                          tile2_spread_ok)
    S = pre.blocked.shape[0]
    H, W = pre.height, pre.width
    # compositing always runs f32 even over a bf16 gather table
    dtype = jnp.promote_types(pre.blocked.dtype, jnp.float32)
    grid = jnp.asarray(pixel_grid_homo(H, W), dtype)
    grid_flat = grid.reshape(3, -1)

    K_src_inv = intrinsics_inverse(K_src)
    depths = 1.0 / disparities
    R = G_tgt_src[:3, :3]
    t = G_tgt_src[:3, 3]
    RKinv = jnp.matmul(R, K_src_inv, precision=_HI)
    H_ts, H_st = plane_homographies(G_tgt_src, K_src, K_tgt, depths)
    zeros_hw = jnp.zeros((H, W), dtype)

    # hoist the per-plane coordinate math out of the scan: coords/flow for
    # ALL planes in two batched matmuls ([S,3,3] x [3,HW]); the scan body is
    # then gather + elementwise only
    src_homo = jnp.matmul(H_st, grid_flat[None], precision=_HI)   # [S,3,N]
    coords_all = (src_homo[:, 0:2] / src_homo[:, 2:3]).reshape(-1, 2, H, W)
    tgt_homo = jnp.matmul(H_ts, grid_flat[None], precision=_HI)
    flow_all = ((tgt_homo[:, 0:2] / tgt_homo[:, 2:3])
                - grid_flat[None, 0:2]).reshape(-1, 2, H, W)
    valid_sum = ((coords_all[:, 0] < W) & (coords_all[:, 0] > -1)
                 & (coords_all[:, 1] < H) & (coords_all[:, 1] > -1)
                 ).astype(dtype).sum(0)

    halo = pre.halo

    def make_step(warp_fn):
        """Scan step; warp_fn(s_idx, coords_hw2, extra_xs) -> warped [5,H,W]
        selects the gather strategy (XLA blocked / quad / pallas kernel)."""

        def step(carry, xs):
            (T_tgt_acc, w_sum, rgb_acc, z_acc, obj_acc, flow_acc, wmax,
             flow_at_max, prev_rgb, prev_sigma, prev_xyz, prev_obj) = carry
            s_idx, depth_s, coords, flow_s, w_src_s = xs[:5]
            warped5 = warp_fn(s_idx, coords.transpose(1, 2, 0),
                              xs[5:]).astype(dtype)
            rgb_w = warped5[0:3]
            sigma_w = warped5[3]
            obj_w = warped5[4]
            # analytic warped xyz (linear in the clamped source coords);
            # written as explicit FMAs to keep it on the VPU
            xc = jnp.clip(coords[0], 0.0, W - 1.0)
            yc = jnp.clip(coords[1], 0.0, H - 1.0)
            xyz_w = (RKinv[:, 0, None, None] * xc[None]
                     + RKinv[:, 1, None, None] * yc[None]
                     + RKinv[:, 2, None, None]) * depth_s + t[:, None, None]
            sigma_w = jnp.where(xyz_w[2] >= 0, sigma_w, 0.0)

            # source-frame flow accumulation with precomputed weights
            flow_acc = flow_acc + w_src_s[None] * flow_s
            take = w_src_s > wmax
            wmax = jnp.where(take, w_src_s, wmax)
            flow_at_max = jnp.where(take[None], flow_s, flow_at_max)

            # target-frame compositing of the PREVIOUS plane
            is_first = s_idx == 0
            dist_tgt = jnp.linalg.norm(xyz_w - prev_xyz, axis=0)
            T_p = jnp.exp(-prev_sigma * dist_tgt)
            w = jnp.where(is_first, zeros_hw, T_tgt_acc * (1.0 - T_p))
            rgb_acc = rgb_acc + w[None] * prev_rgb
            z_acc = z_acc + w * prev_xyz[2]
            obj_acc = obj_acc + w * prev_obj
            w_sum = w_sum + w
            T_tgt_acc = jnp.where(is_first, T_tgt_acc,
                                  T_tgt_acc * (T_p + cumprod_eps))
            return (T_tgt_acc, w_sum, rgb_acc, z_acc, obj_acc, flow_acc,
                    wmax, flow_at_max, rgb_w, sigma_w, xyz_w, obj_w), None

        return step

    init = (jnp.ones((H, W), dtype), zeros_hw,
            jnp.zeros((3, H, W), dtype), zeros_hw, zeros_hw,
            jnp.zeros((2, H, W), dtype),
            jnp.full((H, W), -jnp.inf, dtype), jnp.zeros((2, H, W), dtype),
            jnp.zeros((3, H, W), dtype), zeros_hw,
            jnp.zeros((3, H, W), dtype), zeros_hw)
    xs = (jnp.arange(S), depths, coords_all, flow_all, pre.w_src)

    def xla_warp(halo_, use_quad):
        sample = (bilinear_sample_blocked_tile2 if use_quad
                  else bilinear_sample_blocked)
        if _FLAT_GATHER:
            Nb = pre.blocked.shape[1]
            flat = pre.blocked.reshape(S * Nb, pre.blocked.shape[2])
            return lambda s_idx, c, extra: sample(
                flat, 5, H, W, c, halo_, row_offset=s_idx * Nb)
        return lambda s_idx, c, extra: sample(extra[0], 5, H, W, c, halo_)

    if pre.pallas:
        # Pallas warp kernel path with an exact-coverage guard; the
        # fallback re-lays the tables out for the XLA sampler (only
        # executed -- and only worth paying for -- on extreme warps)
        from mpiflow_tpu.ops.pallas_warp import (ky_for_dtype, plan_warp,
                                                 warp_plane_pallas)
        interp = jax.default_backend() == "cpu"
        ky = ky_for_dtype(pre.blocked.dtype)
        coordsT = coords_all.transpose(0, 2, 3, 1)
        # two kernel variants: 2 row candidates cover mild warps (half the
        # per-row gather work, most planes in practice); 4 cover any warp
        # the coverage window accepts; exact XLA fallback beyond that
        qby2, qbx2, rb2, hx2, oks2 = jax.vmap(
            lambda c: plan_warp(c, H, W, ky=ky, row_cands=2))(coordsT)
        qby4, qbx4, rb4, hx4, oks4 = jax.vmap(
            lambda c: plan_warp(c, H, W, ky=ky, row_cands=4))(coordsT)
        ok2 = oks2.all()
        ok4 = oks4.all()
        xs_p2 = xs + (pre.blocked, qby2, qbx2, rb2, hx2)
        xs_p4 = xs + (pre.blocked, qby4, qbx4, rb4, hx4)

        def pallas_warp(rc):
            def warp(s_idx, c, extra):
                table_s, qby_s, qbx_s, rb_s, hx_s = extra
                return warp_plane_pallas(table_s, c, qby_s, qbx_s, rb_s,
                                         hx_s, 5, H, W, interpret=interp,
                                         ky=ky, row_cands=rc)
            return warp

        def fallback_warp(s_idx, c, extra):
            table_s = extra[0]                            # [45,Hb,Wb]
            blocked_s = table_s.reshape(45, -1).T         # [Nb,45]
            return bilinear_sample_blocked(blocked_s, 5, H, W, c)

        carry = jax.lax.cond(
            ok2,
            lambda: jax.lax.scan(make_step(pallas_warp(2)), init, xs_p2)[0],
            lambda: jax.lax.cond(
                ok4,
                lambda: jax.lax.scan(make_step(pallas_warp(4)), init,
                                     xs_p4)[0],
                lambda: jax.lax.scan(make_step(fallback_warp), init,
                                     xs_p4)[0]))
    elif halo == 5:
        # quad path if every plane's warp is tile-coherent, else exact
        # per-pixel fallback (numerics of the two paths are bit-identical
        # when the predicate holds; the fallback covers when it doesn't)
        if not _FLAT_GATHER:
            xs = xs + (pre.blocked,)
        ok = tile2_spread_ok(coords_all.transpose(0, 2, 3, 1), H, W)
        carry = jax.lax.cond(
            ok,
            lambda: jax.lax.scan(make_step(xla_warp(5, True)), init, xs)[0],
            lambda: jax.lax.scan(make_step(xla_warp(5, False)), init, xs)[0])
    else:
        if not _FLAT_GATHER:
            xs = xs + (pre.blocked,)
        carry, _ = jax.lax.scan(make_step(xla_warp(halo, False)), init, xs)
    (T_tgt_acc, w_sum, rgb_acc, z_acc, obj_acc, flow_acc, wmax,
     flow_at_max, prev_rgb, prev_sigma, prev_xyz, prev_obj) = carry

    T_p = jnp.exp(-prev_sigma * jnp.full((H, W), far_cap, dtype))
    w = T_tgt_acc * (1.0 - T_p)
    rgb_acc = rgb_acc + w[None] * prev_rgb
    z_acc = z_acc + w * prev_xyz[2]
    obj_acc = obj_acc + w * prev_obj
    w_sum = w_sum + w

    depth = z_acc / (w_sum + depth_eps)
    flow = flow_at_max if hard_flow else flow_acc
    flow = jnp.clip(flow, -flow_clip, flow_clip)
    obj_out = (w_sum - obj_acc) if invert_mask else obj_acc
    return NovelView(frame=rgb_acc, depth=depth, flow=flow,
                     obj_mask=obj_out, valid_sum=valid_sum)


def _render_batched(mpi_rgb, mpi_sigma, dist_src_all, H_ts, H_st, depths,
                    R, t, K_inv, grid_flat, obj, has_src, src, flow_clip,
                    cumprod_eps, far_cap, depth_eps, hard_flow) -> NovelView:
    """Plane-parallel variant of render_novel_view (see `mode`)."""
    S, _, H, W = mpi_rgb.shape
    dtype = mpi_rgb.dtype

    def exclusive_cumprod(T):  # [S,...]
        acc = jnp.cumprod(T + cumprod_eps, axis=0)
        return jnp.concatenate([jnp.ones_like(T[:1]), acc[:-1]], axis=0)

    # source-frame transmittance chain (flow weights + rgb blend weights)
    T_src = jnp.exp(-mpi_sigma[:, 0] * dist_src_all)            # [S,H,W]
    T_src_acc = exclusive_cumprod(T_src)
    w_src = T_src_acc * (1.0 - T_src)

    # per-plane coords / validity / analytic flow, all planes at once
    src_homo = jnp.matmul(H_st, grid_flat[None], precision=_HI)  # [S,3,HW]
    coords = (src_homo[:, 0:2] / src_homo[:, 2:3]).reshape(S, 2, H, W)
    valid = ((coords[:, 0] < W) & (coords[:, 0] > -1)
             & (coords[:, 1] < H) & (coords[:, 1] > -1)).astype(dtype)
    tgt_homo = jnp.matmul(H_ts, grid_flat[None], precision=_HI)
    flow_all = ((tgt_homo[:, 0:2] / tgt_homo[:, 2:3])
                - grid_flat[None, 0:2]).reshape(S, 2, H, W)

    rgb = mpi_rgb
    if has_src:
        rgb = T_src_acc[:, None] * src[None] + (1 - T_src_acc[:, None]) * rgb
    stack = jnp.concatenate(
        [rgb, mpi_sigma,
         jnp.broadcast_to(obj[None, None], (S, 1, H, W))], axis=1)

    warped5 = jax.vmap(bilinear_sample_border)(
        stack, coords.transpose(0, 2, 3, 1))                    # [S,5,H,W]

    # warped xyz reconstructed analytically (linear in source coords; see
    # warped_xyz_analytic in render_novel_view)
    xc = jnp.clip(coords[:, 0], 0.0, W - 1.0).reshape(S, -1)
    yc = jnp.clip(coords[:, 1], 0.0, H - 1.0).reshape(S, -1)
    v = jnp.stack([xc, yc, jnp.ones_like(xc)], axis=1)          # [S,3,HW]
    RKinv = jnp.matmul(R, K_inv, precision=_HI)
    xyz_w = (jnp.matmul(RKinv[None], v, precision=_HI)
             * depths[:, None, None] + t[None, :, None]).reshape(S, 3, H, W)
    warped = jnp.concatenate(
        [warped5[:, 0:4], xyz_w, warped5[:, 4:5]], axis=1)      # [S,8,H,W]
    sigma_w = jnp.where(warped[:, 6] >= 0, warped[:, 3], 0.0)   # z>=0 mask
    d = jnp.linalg.norm(xyz_w[1:] - xyz_w[:-1], axis=1)
    d = jnp.concatenate([d, jnp.full((1, H, W), far_cap, dtype)], axis=0)
    T_tgt = jnp.exp(-sigma_w * d)
    T_tgt_acc = exclusive_cumprod(T_tgt)
    w_tgt = T_tgt_acc * (1.0 - T_tgt)                           # [S,H,W]

    frame = (w_tgt[:, None] * warped[:, 0:3]).sum(0)
    z_sum = (w_tgt * xyz_w[:, 2]).sum(0)
    depth = z_sum / (w_tgt.sum(0) + depth_eps)
    obj_out = (w_tgt * warped[:, 7]).sum(0)
    if hard_flow:
        idx = jnp.argmax(w_src, axis=0)                         # [H,W]
        flow = jnp.take_along_axis(
            flow_all, idx[None, None].repeat(2, 1), axis=0)[0]
    else:
        flow = (w_src[:, None] * flow_all).sum(0)
    flow = jnp.clip(flow, -flow_clip, flow_clip)
    return NovelView(frame=frame, depth=depth, flow=flow, obj_mask=obj_out,
                     valid_sum=valid.sum(0))
