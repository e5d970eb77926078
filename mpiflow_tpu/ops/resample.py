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

    dt = img.dtype
    w00 = ((1.0 - fy) * (1.0 - fx))[None].astype(dt)
    w01 = ((1.0 - fy) * fx)[None].astype(dt)
    w10 = (fy * (1.0 - fx))[None].astype(dt)
    w11 = (fy * fx)[None].astype(dt)
    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out.reshape((C,) + out_shape)


def _interp_matrix(n_in: int, n_out: int, align_corners: bool):
    """Dense 1-D linear-interpolation matrix [n_out, n_in] (2 nonzeros/row).

    Image resizing is separable, so a resize is two small matmuls instead of
    a per-pixel gather -- XLA TPU gathers are index-rate bound while these
    matmuls are effectively free. Zero entries don't perturb f32 sums, so
    results are bit-equal to the gather formulation.
    """
    import numpy as np
    if align_corners:
        pos = np.arange(n_out, dtype=np.float64) * (
            (n_in - 1) / max(n_out - 1, 1))
    else:
        pos = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
        pos = np.clip(pos, 0, n_in - 1)
    i0 = np.minimum(np.floor(pos).astype(np.int64), n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = (pos - i0).astype(np.float32)
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), i0] += 1.0 - f
    M[np.arange(n_out), i1] += f
    return M


def _resize_matmul(img: jnp.ndarray, out_h: int, out_w: int,
                   align_corners: bool) -> jnp.ndarray:
    C, H, W = img.shape
    My = jnp.asarray(_interp_matrix(H, out_h, align_corners), img.dtype)
    Mx = jnp.asarray(_interp_matrix(W, out_w, align_corners), img.dtype)
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,chw->cow", My, img, precision=hi)
    return jnp.einsum("pw,cow->cop", Mx, out, precision=hi)


def resize_bilinear_align_corners(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [C,H,W] -> [C,out_h,out_w], torch bilinear align_corners=True."""
    C, H, W = img.shape
    if (H, W) == (out_h, out_w):
        return img
    return _resize_matmul(img, out_h, out_w, align_corners=True)


def blocked_source(img: jnp.ndarray, halo: int = 3) -> jnp.ndarray:
    """Re-layout [C,H,W] into 2x2-stride blocks with a (halo x halo) patch:
    blocked[yb*Wb+xb, (dy*halo+dx)*C+c] = img[c, 2yb+dy, 2xb+dx].

    halo=3: any bilinear 2x2 tap window (y0, x0) with y0<=H-2, x0<=W-2 lies
    inside block (y0//2, x0//2), so `bilinear_sample_blocked` needs ONE
    gathered row per sample instead of four -- XLA TPU gathers are
    index-rate bound, so this is ~4x faster at 2.25x memory.
    halo=5: one gathered row covers the tap windows of a whole 2x2 OUTPUT
    tile whenever the warp's local stretch is <= ~2px/px (see
    `bilinear_sample_blocked_tile2`) -- a further 4x fewer indices.
    Built with strided slices only.
    """
    C, H, W = img.shape
    Hb, Wb = (H + 1) // 2, (W + 1) // 2
    pad = jnp.pad(img, ((0, 0), (0, 2 * Hb + halo - 2 - H),
                        (0, 2 * Wb + halo - 2 - W)), mode="edge")
    # build the row-major [block, tap*C] layout DIRECTLY: each strided
    # slice+transpose fuses into the concat's output buffer, so peak memory
    # is one output copy (stack+.T would materialize ~3 layout-sized temps)
    taps = [pad[:, dy:dy + 2 * Hb:2, dx:dx + 2 * Wb:2]
            .transpose(1, 2, 0)[:, :, None, :]           # [Hb,Wb,1,C]
            for dy in range(halo) for dx in range(halo)]
    return jnp.concatenate(taps, axis=2).reshape(Hb * Wb, halo * halo * C)


def bilinear_sample_blocked(blocked: jnp.ndarray, num_channels: int,
                            H: int, W: int, coords: jnp.ndarray,
                            halo: int = 3, row_offset=0) -> jnp.ndarray:
    """Border-clamped bilinear sampling from a `blocked_source` layout.

    Bit-identical to `bilinear_sample_border` (same tap/weight math), with
    one gather instead of four. coords [...,2] -> [C, ...]. `halo` must
    match the layout's; halos > 3 read the same top-left 4x4 sub-patch.
    `row_offset` is added to the gathered row index -- pass s*Hb*Wb to
    sample plane s of a stack of blocked layouts flattened to
    [S*Hb*Wb, halo^2*C] (avoids materializing per-plane slices in a scan).
    """
    C = num_channels
    Wb = (W + 1) // 2
    out_shape = coords.shape[:-1]
    x = jnp.clip(coords[..., 0].reshape(-1), 0.0, W - 1.0)
    y = jnp.clip(coords[..., 1].reshape(-1), 0.0, H - 1.0)
    # shifted-base taps: y0 <= H-2 with fy in [0,1] handles the border rows
    # with exactly the same interpolated values as clamp-tap logic
    x0 = jnp.minimum(jnp.floor(x), W - 2.0)
    y0 = jnp.minimum(jnp.floor(y), H - 2.0)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idx = row_offset + (y0i >> 1) * Wb + (x0i >> 1)
    rows = jnp.take(blocked, idx, axis=0)                   # [N, halo^2*C]
    p = rows.reshape(-1, halo, halo, C)
    oy = (y0i & 1)[:, None]
    ox = (x0i & 1)[:, None]

    def tap(dy, dx):
        # select patch element (oy+dy, ox+dx) via parity masks
        v00 = p[:, dy, dx]
        v01 = p[:, dy, dx + 1]
        v10 = p[:, dy + 1, dx]
        v11 = p[:, dy + 1, dx + 1]
        return jnp.where(oy == 0, jnp.where(ox == 0, v00, v01),
                         jnp.where(ox == 0, v10, v11))

    dt = blocked.dtype
    w00 = ((1 - fy) * (1 - fx))[:, None].astype(dt)
    w01 = ((1 - fy) * fx)[:, None].astype(dt)
    w10 = (fy * (1 - fx))[:, None].astype(dt)
    w11 = (fy * fx)[:, None].astype(dt)
    out = tap(0, 0) * w00 + tap(0, 1) * w01 + tap(1, 0) * w10 + tap(1, 1) * w11
    return out.T.reshape((C,) + out_shape)


def _tile2_bases(coords: jnp.ndarray, H: int, W: int):
    """Shared tap-base math for the 2x2-output-tile sampler and its
    exactness predicate. coords [Ho,Wo,2] (Ho,Wo even) -> per-pixel
    (x0i, y0i, fx, fy) laid out [Nt,4] tile-major, plus per-tile
    (bx, by) block bases [Nt]."""
    Ho, Wo = coords.shape[:2]
    x = jnp.clip(coords[..., 0], 0.0, W - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, H - 1.0)
    x0 = jnp.minimum(jnp.floor(x), W - 2.0)
    y0 = jnp.minimum(jnp.floor(y), H - 2.0)

    def tiles(a):  # [Ho,Wo] -> [Nt,4]
        return (a.reshape(Ho // 2, 2, Wo // 2, 2)
                .transpose(0, 2, 1, 3).reshape(-1, 4))

    fx = tiles(x - x0)
    fy = tiles(y - y0)
    x0i = tiles(x0.astype(jnp.int32))
    y0i = tiles(y0.astype(jnp.int32))
    bx = x0i.min(axis=1) >> 1                               # [Nt]
    by = y0i.min(axis=1) >> 1
    return x0i, y0i, fx, fy, bx, by


def tile2_spread_ok(coords: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """True iff `bilinear_sample_blocked_tile2` is exact for these coords:
    within every 2x2 output tile the integer tap bases must span <= 2 px
    per axis (local warp stretch <= ~2px/px -- always true for this
    pipeline's pose distributions; a global homography would need scale>2).
    coords [...,Ho,Wo,2]; leading axes (e.g. planes) are all checked."""
    c = coords.reshape((-1,) + coords.shape[-3:])

    def one(ci):
        x0i, y0i, _, _, _, _ = _tile2_bases(ci, H, W)
        sx = x0i.max(axis=1) - x0i.min(axis=1)
        sy = y0i.max(axis=1) - y0i.min(axis=1)
        return (jnp.maximum(sx, sy) <= 2).all()

    return jax.vmap(one)(c).all()


def bilinear_sample_blocked_tile2(blocked: jnp.ndarray, num_channels: int,
                                  H: int, W: int, coords: jnp.ndarray,
                                  halo: int = 5, row_offset=0) -> jnp.ndarray:
    """Border-clamped bilinear sampling with ONE gathered row per 2x2
    OUTPUT tile (4x fewer gather indices than `bilinear_sample_blocked`,
    16x fewer than the naive 4-tap form; XLA TPU gathers are index-rate
    bound at ~220M indices/s while row width is nearly free).

    Requires a `blocked_source(img, halo=5)` layout and even output dims.
    EXACT (bit-identical to `bilinear_sample_border`) whenever
    `tile2_spread_ok(coords)` holds: the 4 pixels of an output tile then
    share one 5x5 source patch and each reads its own 2x2 window from it.
    coords [Ho,Wo,2] -> [C,Ho,Wo].
    """
    C = num_channels
    Ho, Wo = coords.shape[:2]
    Wb = (W + 1) // 2
    x0i, y0i, fx, fy, bx, by = _tile2_bases(coords, H, W)

    rows = jnp.take(blocked, row_offset + by * Wb + bx, axis=0)  # [Nt,halo^2*C]
    p = rows.reshape(-1, halo, halo, C)
    oy = y0i - 2 * by[:, None]                              # [Nt,4] in [0,3]
    ox = x0i - 2 * bx[:, None]

    # two-stage 4-way selects: rows then cols (cheaper intermediates than a
    # single 16-way select)
    r = p[:, None, 3:5]                                     # [Nt,1,2,halo,C]
    for o in (2, 1, 0):
        r = jnp.where((oy == o)[:, :, None, None, None],
                      p[:, None, o:o + 2], r)               # [Nt,4,2,halo,C]
    sub = r[:, :, :, 3:5]
    for o in (2, 1, 0):
        sub = jnp.where((ox == o)[:, :, None, None, None],
                        r[:, :, :, o:o + 2], sub)           # [Nt,4,2,2,C]

    dt = blocked.dtype
    w00 = ((1 - fy) * (1 - fx))[..., None].astype(dt)       # [Nt,4,1]
    w01 = ((1 - fy) * fx)[..., None].astype(dt)
    w10 = (fy * (1 - fx))[..., None].astype(dt)
    w11 = (fy * fx)[..., None].astype(dt)
    out = (sub[:, :, 0, 0] * w00 + sub[:, :, 0, 1] * w01
           + sub[:, :, 1, 0] * w10 + sub[:, :, 1, 1] * w11)  # [Nt,4,C]
    return (out.reshape(Ho // 2, Wo // 2, 2, 2, C)
            .transpose(4, 0, 2, 1, 3).reshape(C, Ho, Wo))


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [C,H,W], torch bilinear align_corners=False (half-pixel centers
    with border clamping; F.interpolate's default)."""
    C, H, W = img.shape
    if (H, W) == (out_h, out_w):
        return img
    return _resize_matmul(img, out_h, out_w, align_corners=False)


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
        return (hi - lo) / jnp.asarray(counts, arr.dtype).reshape(shape)

    x = pool_axis(x, out_h, -2)
    x = pool_axis(x, out_w, -1)
    return x
