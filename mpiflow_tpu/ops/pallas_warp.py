"""Pallas TPU kernel for the MPI warp gather.

The render hot loop is a border-clamped bilinear gather of a 5-channel
plane stack at homography-warped coordinates. In XLA this is an HBM gather,
index-rate bound at ~220M indices/s on v5e (ops/resample.py). This kernel
instead streams table tiles into VMEM with scalar-prefetched, data-dependent
BlockSpecs and runs the per-pixel lookup as vreg-local `dynamic_gather`s --
the only gather shape this hardware generation supports natively.

Structure (one plane, output H x W):
  * table: the halo-3 blocked layout (ops/resample.blocked_source) shaped
    [9C, Hb, Wb] -- one row index per output pixel covers all 4 bilinear
    taps of that pixel.
  * grid: (H/8 output row-bands) x (W/128 output column-chunks).
  * for each grid step, FOUR table tiles [9C, 8, 128] are fetched at
    anchors (qby,qbx), (qby+1,qbx), (qby,qbx+1), (qby+1,qbx+1): a logical
    [9C, 16, 256] window. Anchors are quantized to block units (Pallas
    blocked indexing), and the doubled extent absorbs the quantization
    slack, so the window provably covers the chunk's tap windows whenever
      (by0 mod 8) + span_y <= 15  and  (bx0 mod 128) + span_x <= 255
    -- true for every warp this pipeline produces (local stretch <= ~2).
    `pallas_warp_ok` checks it exactly; callers lax.cond to the XLA path
    otherwise, so numerics are exact for ANY pose.
  * per output row, the 4 candidate source block-rows around a prefetched
    per-row base are gathered with `take_along_axis` on [9C,128] vregs
    (vreg-local => supported) and combined by mask -- no cross-vreg
    gathers anywhere.

Numerics are BIT-IDENTICAL to ops.resample.bilinear_sample_border /
bilinear_sample_blocked: same clamped tap bases, same parity tap selection,
same weight products and sum order (tests/test_pallas_warp.py).

Reference behavior accelerated: homography_sampler.py:149-156
(grid_sample border, align_corners=False at raw pixel coords).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile geometry (one output band = BAND_H rows x CHUNK_W cols)
BAND_H = 8
CHUNK_W = 128
KY = 8            # table tile height (block-rows); window = 2*KY
KX = 128          # table tile width (block-cols);  window = 2*KX
ROW_CANDS = 4     # candidate block-rows per output row (span guard <= 3)


def supported_shape(H: int, W: int, ky: int = KY) -> bool:
    """Static shape constraints of the kernel's tiling. bf16 tables need
    ky=16 (Mosaic's minimum bf16 sublane tile); f32 uses ky=8."""
    Hb, Wb = H // 2, W // 2
    return (H % (2 * ky) == 0 and W % (2 * KX) == 0
            and Hb >= 2 * ky and Wb >= 2 * KX)


def ky_for_dtype(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize < 4 else KY


def table_from_image(img: jnp.ndarray) -> jnp.ndarray:
    """[C,H,W] -> blocked table [9C, Hb, Wb] (halo-3, transposed layout:
    table[(dy*3+dx)*C + c, yb, xb] = img[c, 2yb+dy, 2xb+dx]).

    Kept as nine stride-2 slices deliberately: a reshape-of-shifted-rows
    form is ~11% faster STANDALONE (48.7 vs 54.1 ms at 64x5x384x1280 on
    v5e) but 15% slower inside the fused sample pipeline -- the reshape
    intermediates act as a partial materialization barrier, while the
    stride-2 slices fuse with the upstream blend math and overlap the
    gather-bound renders for free (bench.py measured both ways)."""
    C, H, W = img.shape
    Hb, Wb = (H + 1) // 2, (W + 1) // 2
    pad = jnp.pad(img, ((0, 0), (0, 2 * Hb + 1 - H), (0, 2 * Wb + 1 - W)),
                  mode="edge")
    taps = [pad[:, dy:dy + 2 * Hb:2, dx:dx + 2 * Wb:2]
            for dy in range(3) for dx in range(3)]
    return jnp.concatenate(taps, axis=0)                    # [9C, Hb, Wb]


def _tap_bases(coords: jnp.ndarray, H: int, W: int):
    """Clamped integer tap bases + fractions, exactly as
    ops.resample.bilinear_sample_blocked computes them.
    coords [..., 2] (x, y) -> (x0i, y0i, fx, fy)."""
    x = jnp.clip(coords[..., 0], 0.0, W - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, H - 1.0)
    x0 = jnp.minimum(jnp.floor(x), W - 2.0)
    y0 = jnp.minimum(jnp.floor(y), H - 2.0)
    return (x0.astype(jnp.int32), y0.astype(jnp.int32), x - x0, y - y0)


def plan_warp(coords: jnp.ndarray, H: int, W: int, ky: int = KY,
              row_cands: int = ROW_CANDS):
    """Host(XLA)-side planning for one plane: tile anchors, per-row bases,
    and the exact coverage predicate.

    coords: [H, W, 2] raw pixel coordinates.
    row_cands: candidate block-rows the kernel will scan per output row;
    the returned `ok` is False whenever any row's block span exceeds it
    (mild warps fit 2 -- half the kernel's gather work; 4 covers every
    warp the coverage window accepts).
    Returns (qby [nb,nc], qbx [nb,nc], rowbase [nb,BAND_H,nc] int32,
             ok [] bool).
    """
    KY = ky
    ROW_CANDS = row_cands
    Hb, Wb = H // 2, W // 2
    nb, nc = H // BAND_H, W // CHUNK_W
    x0i, y0i, _, _ = _tap_bases(coords, H, W)
    ybl = (y0i >> 1).reshape(nb, BAND_H, nc, CHUNK_W)
    xbl = (x0i >> 1).reshape(nb, BAND_H, nc, CHUNK_W)

    by_min = ybl.min(axis=(1, 3))
    by_max = ybl.max(axis=(1, 3))
    bx_min = xbl.min(axis=(1, 3))
    bx_max = xbl.max(axis=(1, 3))
    qby = jnp.minimum(by_min // KY, Hb // KY - 2)
    qbx = jnp.minimum(bx_min // KX, Wb // KX - 2)

    # per-row candidate base (local to the window)
    row_min = ybl.min(axis=3)                               # [nb,BAND_H,nc]
    row_max = ybl.max(axis=3)
    rowbase = jnp.clip(row_min - qby[:, None, :] * KY, 0,
                       2 * KY - ROW_CANDS)

    ok = ((by_max - qby * KY <= 2 * KY - 1).all()
          & (bx_max - qbx * KX <= 2 * KX - 1).all()
          & (by_min - qby * KY >= 0).all()
          & (bx_min - qbx * KX >= 0).all()
          & (row_max - row_min <= ROW_CANDS - 1).all())
    # Per-chunk kernel-work flags (both skips are EXACT -- candidates /
    # taps outside the marked region are mask-rejected in the kernel):
    #   bit 0: x-windows touch the hi x-tile (else skip the hi merge +
    #          hi gather per candidate, ~half of all chunks)
    #   bit 1: some candidate row lies in the upper y-tile halves (else
    #          skip the t10/t11 scratch merges)
    needs_hi = (bx_max - qbx * KX >= KX).astype(jnp.int32)
    needs_hy = (rowbase.max(axis=1) + ROW_CANDS - 1 >= KY).astype(jnp.int32)
    flags = needs_hi | (needs_hy << 1)
    return (qby.astype(jnp.int32), qbx.astype(jnp.int32),
            rowbase.astype(jnp.int32), flags, ok)


def _warp_band_kernel(qby_ref, qbx_ref, rowbase_ref, hx_ref,
                      t00_ref, t01_ref, t10_ref, t11_ref, coords_ref,
                      out_ref, lo_ref, hi_ref, *, C: int, H: int, W: int,
                      KY: int = KY, RC: int = ROW_CANDS):
    """One (band, chunk) step.

    t{y}{x}_ref: the four [9C, KY, KX] table tiles of the logical window.
    coords_ref: [2, BAND_H, CHUNK_W]; out_ref: [C, BAND_H, CHUNK_W].
    hx_ref[iy, ix] holds per-chunk work flags from plan_warp: bit 0 set
    when the x-windows touch the hi x-tile (else the hi merge + hi gather
    per candidate are skipped -- exact, in_hi_x is all-false there), bit 1
    set when a candidate row lives in the upper y-tile halves (else the
    t10/t11 merges are skipped -- exact, stale reads are ly-mask-rejected).
    """
    iy = pl.program_id(0)
    ix = pl.program_id(1)
    base_y = qby_ref[iy, ix] * KY
    base_x = qbx_ref[iy, ix] * KX
    flags = hx_ref[iy, ix]
    use_hi = (flags & 1) != 0
    use_hy = (flags & 2) != 0

    # merge the y-tile pairs into VMEM scratch once per step so the per-row
    # candidate loop does ONE dynamic-slice load per (candidate, x-group)
    # instead of two loads + a select (dynamic slicing works on refs only).
    # Upper halves are merged only when some candidate row lives there
    # (use_hy) -- skipped halves may hold stale data, but every candidate
    # read from them is rejected by the ly == r mask, so results are exact.
    # scratch is always f32: bf16 tables halve the HBM->VMEM DMA (the
    # kernel's bound) and upcast here, keeping the per-row dynamic slices
    # and vreg gathers on f32 layouts (Mosaic cannot dynamically slice
    # single sublane rows of bf16 tiles)
    lo_ref[:, 0:KY, :] = t00_ref[...].astype(lo_ref.dtype)

    @pl.when(use_hy)
    def _():
        lo_ref[:, KY:2 * KY, :] = t10_ref[...].astype(lo_ref.dtype)

    @pl.when(use_hi)
    def _():
        hi_ref[:, 0:KY, :] = t01_ref[...].astype(hi_ref.dtype)

    @pl.when(jnp.logical_and(use_hi, use_hy))
    def _():
        hi_ref[:, KY:2 * KY, :] = t11_ref[...].astype(hi_ref.dtype)

    def band(with_hi):
        for i in range(BAND_H):
            cxy = coords_ref[:, i, :]                       # [2, 128]
            x = jnp.clip(cxy[0:1], 0.0, W - 1.0)
            y = jnp.clip(cxy[1:2], 0.0, H - 1.0)
            x0 = jnp.minimum(jnp.floor(x), W - 2.0)
            y0 = jnp.minimum(jnp.floor(y), H - 2.0)
            fx = x - x0                                     # [1, 128]
            fy = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            ly = (y0i >> 1) - base_y                        # [0,2KY)
            lx = (x0i >> 1) - base_x                        # [0,2KX)
            oy = y0i & 1
            ox = x0i & 1

            lx_lo = jnp.broadcast_to(jnp.clip(lx, 0, KX - 1),
                                     (9 * C, CHUNK_W))
            rb = rowbase_ref[iy, i, ix]                     # in [0,2KY)
            if with_hi:
                lx_hi = jnp.broadcast_to(jnp.clip(lx - KX, 0, KX - 1),
                                         (9 * C, CHUNK_W))
                in_hi_x = lx >= KX                          # [1, 128]

            rows = jnp.zeros((9 * C, CHUNK_W), jnp.float32)
            for j in range(RC):
                r = rb + j                                  # dynamic
                lo_y = lo_ref[:, pl.dslice(r, 1), :][:, 0, :]
                g_lo = jnp.take_along_axis(lo_y, lx_lo, axis=1)
                if with_hi:
                    hi_y = hi_ref[:, pl.dslice(r, 1), :][:, 0, :]
                    g_hi = jnp.take_along_axis(hi_y, lx_hi, axis=1)
                    cand = jnp.where(in_hi_x, g_hi, g_lo)
                else:
                    cand = g_lo
                rows = rows + jnp.where(ly == r, cand, 0.0)

            def tap(dy, dx):
                def patch(a, b):
                    t = a * 3 + b
                    return rows[t * C:(t + 1) * C, :]       # [C, 128]
                v00 = patch(dy, dx)
                v01 = patch(dy, dx + 1)
                v10 = patch(dy + 1, dx)
                v11 = patch(dy + 1, dx + 1)
                return jnp.where(oy == 0, jnp.where(ox == 0, v00, v01),
                                 jnp.where(ox == 0, v10, v11))

            w00 = (1 - fy) * (1 - fx)
            w01 = (1 - fy) * fx
            w10 = fy * (1 - fx)
            w11 = fy * fx
            out_ref[:, i, :] = (tap(0, 0) * w00 + tap(0, 1) * w01
                                + tap(1, 0) * w10 + tap(1, 1) * w11)

    @pl.when(use_hi)
    def _():
        band(True)

    @pl.when(jnp.logical_not(use_hi))
    def _():
        band(False)


@functools.partial(jax.jit,
                   static_argnames=("num_channels", "H", "W", "interpret",
                                    "ky", "row_cands"))
def warp_plane_pallas(table: jnp.ndarray, coords: jnp.ndarray,
                      qby: jnp.ndarray, qbx: jnp.ndarray,
                      rowbase: jnp.ndarray, needs_hi: jnp.ndarray,
                      num_channels: int,
                      H: int, W: int, interpret: bool = False,
                      ky: int = KY,
                      row_cands: int = ROW_CANDS) -> jnp.ndarray:
    """Warp one plane. table [9C,Hb,Wb]; coords [H,W,2]; planning arrays
    from `plan_warp`. Returns [C,H,W]; bit-identical to
    bilinear_sample_border(img, coords) whenever plan_warp's `ok` holds.
    """
    C = num_channels
    KY = ky
    nb, nc = H // BAND_H, W // CHUNK_W
    cT = coords.transpose(2, 0, 1)                          # [2, H, W]

    def y_lo(iy, ix, qby, qbx, rb, hx):
        return (0, qby[iy, ix], qbx[iy, ix])

    def y_hi(iy, ix, qby, qbx, rb, hx):
        return (0, qby[iy, ix] + 1, qbx[iy, ix])

    def x_hi(iy, ix, qby, qbx, rb, hx):
        return (0, qby[iy, ix], qbx[iy, ix] + 1)

    def yx_hi(iy, ix, qby, qbx, rb, hx):
        return (0, qby[iy, ix] + 1, qbx[iy, ix] + 1)

    out = pl.pallas_call(
        functools.partial(_warp_band_kernel, C=C, H=H, W=W, KY=KY,
                          RC=row_cands),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nb, nc),
            in_specs=[
                pl.BlockSpec((9 * C, KY, KX), y_lo),
                pl.BlockSpec((9 * C, KY, KX), x_hi),
                pl.BlockSpec((9 * C, KY, KX), y_hi),
                pl.BlockSpec((9 * C, KY, KX), yx_hi),
                pl.BlockSpec((2, BAND_H, CHUNK_W),
                             lambda iy, ix, *_: (0, iy, ix)),
            ],
            out_specs=pl.BlockSpec((C, BAND_H, CHUNK_W),
                                   lambda iy, ix, *_: (0, iy, ix)),
            scratch_shapes=[
                pltpu.VMEM((9 * C, 2 * KY, KX), jnp.float32),
                pltpu.VMEM((9 * C, 2 * KY, KX), jnp.float32),
            ],
        ),
        # output always f32: with a bf16 table the gathered taps are
        # combined with f32 bilinear weights (promotion in the final FMA)
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        interpret=interpret,
    )(qby, qbx, rowbase, needs_hi, table, table, table, table, cT)
    return out


def bilinear_sample_pallas(img: jnp.ndarray, coords: jnp.ndarray,
                           interpret: bool = False):
    """Convenience wrapper: (img [C,H,W], coords [H,W,2]) ->
    (warped [C,H,W] f32, ok bool). Callers must fall back to the XLA
    sampler when `ok` is False (lax.cond); see render/mpi.py."""
    C, H, W = img.shape
    ky = ky_for_dtype(img.dtype)
    table = table_from_image(img)
    qby, qbx, rowbase, needs_hi, ok = plan_warp(coords, H, W, ky=ky)
    out = warp_plane_pallas(table, coords, qby, qbx, rowbase, needs_hi,
                            C, H, W, interpret=interpret, ky=ky)
    return out, ok


_SUPPORTED = {}


def pallas_warp_supported(H: int = 64, W: int = 512,
                          dtype=jnp.float32) -> bool:
    """True if the current backend compiles+runs the warp kernel correctly
    for this table dtype (some remote Mosaic services reject parts of
    Pallas; probe once per dtype). f32 must match the XLA border sampler
    bit-exactly; bf16 within bf16 rounding of the gathered values."""
    key = jnp.dtype(dtype).name
    if key not in _SUPPORTED:
        try:
            from mpiflow_tpu.ops.resample import bilinear_sample_border
            rng = np.random.RandomState(0)
            img32 = rng.rand(2, H, W).astype(np.float32)
            img = jnp.asarray(img32).astype(dtype)
            yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                                 np.arange(W, dtype=np.float32),
                                 indexing="ij")
            coords = jnp.asarray(
                np.stack([xx * 1.1 - 3 + 0.02 * yy, yy * 0.9 + 1], -1))
            out, ok = bilinear_sample_pallas(img, coords)
            ref = bilinear_sample_border(
                img.astype(jnp.float32), coords)
            if jnp.dtype(dtype) == jnp.float32:
                good = bool((np.asarray(out) == np.asarray(ref)).all())
            else:
                good = bool(np.allclose(np.asarray(out), np.asarray(ref),
                                        atol=1e-2))
            _SUPPORTED[key] = bool(ok) and good
        except Exception:  # pragma: no cover - environment dependent
            _SUPPORTED[key] = False
    return _SUPPORTED[key]
