"""Forward warping with z-buffering (TPU equivalent of the reference's C
extension, external/forward_warping/warping.c).

The C kernel iterates source pixels in raster order and, per target pixel:
  * copies src RGB iff this writer's z is smaller than the *previous
    writer's* z (dlut holds the last writer's z, not the min  -- warping.c:19-28)
  * sets valid=1 on any write
  * sets collision=1 iff the pixel has exactly one writer (dlut still at the
    1000 sentinel before the last write)

Scatter-with-sequential-dependency is hostile to TPUs; instead we sort
writers by (target pixel, raster index) -- a single stable argsort -- and
resolve each target group with segment ops:

  * rgb    <- the LAST writer (in raster order) whose z dropped below its
              predecessor's z (bit-exact with the C loop)
  * valid  <- group nonempty
  * collision <- group size == 1

`forward_warp_min` additionally provides the conventional min-z splat (what
the C code plainly intended), which is the production default for new data.
All shapes static; fully jittable.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class WarpResult(NamedTuple):
    rgb: jnp.ndarray        # [H,W,C] warped channels (uint8 semantics, float ok)
    valid: jnp.ndarray      # [H,W] 1 where any source pixel landed
    collision: jnp.ndarray  # [H,W] 1 where exactly one source pixel landed


def forward_warp_raster(src_rgb: jnp.ndarray, idx: jnp.ndarray,
                        idy: jnp.ndarray, z: jnp.ndarray) -> WarpResult:
    """Bit-exact re-expression of warping.c's raster-order splat.

    src_rgb [H,W,C]; idx/idy [H,W] int target coords (pre-clamped like
    moving_obj.py:121-122); z [H,W] float.
    """
    H, W, C = src_rgb.shape
    N = H * W
    tgt = (idy.reshape(-1) * W + idx.reshape(-1)).astype(jnp.int32)   # [N]
    zf = z.reshape(-1)
    rgbf = src_rgb.reshape(N, C)

    # stable sort by target; ties keep raster order
    order = jnp.argsort(tgt, stable=True)
    tgt_s = tgt[order]
    z_s = zf[order]

    # previous writer's z within each target group (1000 sentinel at starts)
    first_of_group = jnp.concatenate(
        [jnp.ones((1,), bool), tgt_s[1:] != tgt_s[:-1]])
    prev_z = jnp.concatenate([jnp.full((1,), 1000.0, z_s.dtype), z_s[:-1]])
    prev_z = jnp.where(first_of_group, 1000.0, prev_z)
    wrote = z_s < prev_z                                               # [N]

    # last writing position per target = segment_max of (sorted position
    # where wrote, else -1)
    pos = jnp.arange(N, dtype=jnp.int32)
    write_pos = jnp.where(wrote, pos, -1)
    last_write = jax.ops.segment_max(write_pos, tgt_s, num_segments=N)  # [N]
    counts = jax.ops.segment_sum(jnp.ones_like(pos), tgt_s, num_segments=N)

    valid = counts > 0
    collision = counts == 1
    # first write in every group always has z < 1000 => every touched target
    # has last_write >= 0
    src_index = order[jnp.clip(last_write, 0, N - 1)]
    rgb = jnp.where(valid[:, None], rgbf[src_index], 0)
    return WarpResult(rgb=rgb.reshape(H, W, C),
                      valid=valid.reshape(H, W).astype(jnp.uint8),
                      collision=collision.reshape(H, W).astype(jnp.uint8))


def forward_warp_min(src_rgb: jnp.ndarray, idx: jnp.ndarray,
                     idy: jnp.ndarray, z: jnp.ndarray,
                     out_hw: Tuple[int, int] = None) -> WarpResult:
    """Conventional min-z forward splat (production default): the nearest
    source pixel wins each target; same valid/collision mask semantics.
    The target grid matches the source (H, W) unless `out_hw` is given
    (e.g. splatting a supersampled source into the base resolution)."""
    H, W, C = src_rgb.shape
    out_h, out_w = out_hw if out_hw is not None else (H, W)
    N = H * W
    M = out_h * out_w
    tgt = (idy.reshape(-1) * out_w + idx.reshape(-1)).astype(jnp.int32)
    zf = z.reshape(-1)
    rgbf = src_rgb.reshape(N, C)

    zmin = jax.ops.segment_min(zf, tgt, num_segments=M)
    counts = jax.ops.segment_sum(jnp.ones((N,), jnp.int32), tgt,
                                 num_segments=M)
    # winner = smallest raster index among those achieving zmin
    is_win = zf <= zmin[tgt]
    pos = jnp.arange(N, dtype=jnp.int32)
    win_pos = jnp.where(is_win, pos, N)
    winner = jax.ops.segment_min(win_pos, tgt, num_segments=M)
    valid = counts > 0
    rgb = jnp.where(valid[:, None], rgbf[jnp.clip(winner, 0, N - 1)], 0)
    return WarpResult(rgb=rgb.reshape(out_h, out_w, C),
                      valid=valid.reshape(out_h, out_w).astype(jnp.uint8),
                      collision=(counts == 1).reshape(out_h, out_w)
                      .astype(jnp.uint8))
