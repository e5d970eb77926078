"""Pallas TPU kernel for RAFT's windowed correlation lookup.

TPU counterpart of the reference's alt_cuda_corr CUDA extension
(RAFT/alt_cuda_corr/correlation_kernel.cu:7-121): per pixel p and pyramid
level i, sample the (2r+1)^2 bilinear window of p's correlation map at
coords/2^i. The XLA formulation (models/raft.corr_lookup_windowed) gathers
2r+2 rows per pixel from HBM, materializing an [P, 2r+2, wl] intermediate,
then one-hot-contracts the column window. This kernel instead streams each
pixel tile's full correlation maps through VMEM once (contiguous DMA, no
gather indices at all) and performs the whole window selection in-core:

  window = R_p @ M_p @ C_p

where M_p [hl, wl] is pixel p's correlation map and R_p [Wn, hl] /
C_p [wl, Wn] are one-hot row/column selectors built in-register from iota
comparisons (clipped + masked exactly like corr_lookup_windowed's
row_ok/col_ok). One-hot matmuls run on the MXU and are exact: each output
element is a single product, so numerics are bit-identical to the XLA path
(same bilinear weight expression, same add order).

The backward (needed for training; coords are stop-gradient'ed each GRU
iteration, models/raft.py:435) is the transpose:

  dM_p = R_p^T @ dwindow @ C_p^T

written per pixel with no scatter conflicts (each pixel owns its map).

Grid: one program per tile of T pixels; per-level pallas_call. Falls back
to the XLA path (probe + static-shape guard) like ops/pallas_warp.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_PIX = 8          # pixels per program
WN_PAD = 16        # Wn = 2r+2 rows of the bilinear window, sublane-padded

_HI = jax.lax.Precision.HIGHEST


def _one_hot_rows(y0, r, Wn, hl, dtype):
    """R [WN_PAD, hl]: R[j, y] = 1 iff y == y0-r+j and the row is in
    bounds (corr_lookup_windowed's rows_c + row_ok semantics)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (WN_PAD, hl), 0)
    y = jax.lax.broadcasted_iota(jnp.int32, (WN_PAD, hl), 1)
    ry = y0 - r + j
    ok = (ry >= 0) & (ry <= hl - 1) & (j < Wn)
    return ((y == jnp.clip(ry, 0, hl - 1)) & ok).astype(dtype)


def _one_hot_cols(x0, r, Wn, wl, dtype):
    """C [wl, WN_PAD]: C[x, k] = 1 iff x == x0-r+k in bounds."""
    x = jax.lax.broadcasted_iota(jnp.int32, (wl, WN_PAD), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (wl, WN_PAD), 1)
    cx = x0 - r + k
    ok = (cx >= 0) & (cx <= wl - 1) & (k < Wn)
    return ((x == jnp.clip(cx, 0, wl - 1)) & ok).astype(dtype)


def _dot(a, b):
    # HIGHEST: the TPU MXU truncates f32 operands to bf16 by default, which
    # would corrupt the selected correlation values (the one-hot factor is
    # exact either way)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)


def _fwd_kernel(aux_ref, corr_ref, out_ref, *, hl: int, wl: int, r: int):
    K = 2 * r + 1
    Wn = K + 1
    for t in range(T_PIX):
        y0 = aux_ref[t, 0].astype(jnp.int32)
        x0 = aux_ref[t, 1].astype(jnp.int32)
        fx = aux_ref[t, 2]
        fy = aux_ref[t, 3]
        M = corr_ref[t]                                     # [hl, wl]
        R = _one_hot_rows(y0, r, Wn, hl, M.dtype)
        Cm = _one_hot_cols(x0, r, Wn, wl, M.dtype)
        Wnd = _dot(_dot(R, M), Cm)                          # [WN_PAD, WN_PAD]
        w00 = (1 - fy) * (1 - fx)
        w01 = (1 - fy) * fx
        w10 = fy * (1 - fx)
        w11 = fy * fx
        out_ref[t] = (Wnd[:K, :K] * w00 + Wnd[:K, 1:K + 1] * w01
                      + Wnd[1:K + 1, :K] * w10
                      + Wnd[1:K + 1, 1:K + 1] * w11)        # [K(dy), K(dx)]


def _bwd_kernel(aux_ref, g_ref, dcorr_ref, *, hl: int, wl: int, r: int):
    K = 2 * r + 1
    Wn = K + 1
    for t in range(T_PIX):
        y0 = aux_ref[t, 0].astype(jnp.int32)
        x0 = aux_ref[t, 1].astype(jnp.int32)
        fx = aux_ref[t, 2]
        fy = aux_ref[t, 3]
        g = g_ref[t]                                        # [K, K] (dy,dx)
        # adjoint of the 4-slice bilinear combine, via static zero-pads
        # (Mosaic has no scatter-add; jnp.pad lowers fine)
        p = WN_PAD - K
        dW = ((1 - fy) * (1 - fx) * jnp.pad(g, ((0, p), (0, p)))
              + (1 - fy) * fx * jnp.pad(g, ((0, p), (1, p - 1)))
              + fy * (1 - fx) * jnp.pad(g, ((1, p - 1), (0, p)))
              + fy * fx * jnp.pad(g, ((1, p - 1), (1, p - 1))))
        # dM = R^T @ dW @ C^T -- transposed one-hots built directly
        RT = _one_hot_rows(y0, r, Wn, hl, g.dtype).T        # [hl, WN_PAD]
        CT = _one_hot_cols(x0, r, Wn, wl, g.dtype).T        # [WN_PAD, wl]
        dcorr_ref[t] = _dot(_dot(RT, dW), CT)               # [hl, wl]


def _aux_from_coords(coords_lvl: jnp.ndarray) -> jnp.ndarray:
    """[P,2] level coords -> aux [P,8] f32 (y0, x0, fx, fy, 0...)."""
    x, y = coords_lvl[:, 0], coords_lvl[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    P = coords_lvl.shape[0]
    aux = jnp.zeros((P, 8), jnp.float32)
    return aux.at[:, 0].set(y0).at[:, 1].set(x0) \
              .at[:, 2].set(x - x0).at[:, 3].set(y - y0)


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def _lookup_level_fwd(corr: jnp.ndarray, aux: jnp.ndarray, r: int,
                      interpret: bool = False) -> jnp.ndarray:
    P, hl, wl = corr.shape
    K = 2 * r + 1
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hl=hl, wl=wl, r=r),
        grid=(P // T_PIX,),
        in_specs=[
            pl.BlockSpec((T_PIX, 8), lambda i: (i, 0)),
            pl.BlockSpec((T_PIX, hl, wl), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T_PIX, K, K), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, K, K), jnp.float32),
        interpret=interpret,
    )(aux, corr)


@functools.partial(jax.jit, static_argnames=("r", "hl", "wl", "interpret"))
def _lookup_level_bwd(g: jnp.ndarray, aux: jnp.ndarray, r: int,
                      hl: int, wl: int,
                      interpret: bool = False) -> jnp.ndarray:
    P = aux.shape[0]
    K = 2 * r + 1
    return pl.pallas_call(
        functools.partial(_bwd_kernel, hl=hl, wl=wl, r=r),
        grid=(P // T_PIX,),
        in_specs=[
            pl.BlockSpec((T_PIX, 8), lambda i: (i, 0)),
            pl.BlockSpec((T_PIX, K, K), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T_PIX, hl, wl), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, hl, wl), jnp.float32),
        interpret=interpret,
    )(aux, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_level(corr, aux, r: int, interpret: bool = False):
    return _lookup_level_fwd(corr, aux, r, interpret)


def _lookup_level_vjp_fwd(corr, aux, r, interpret):
    P, hl, wl = corr.shape
    return _lookup_level_fwd(corr, aux, r, interpret), (aux, hl, wl)


def _lookup_level_vjp_bwd(r, interpret, res, g):
    aux, hl, wl = res
    dcorr = _lookup_level_bwd(g, aux, r, hl, wl, interpret)
    return dcorr, None


_lookup_level.defvjp(_lookup_level_vjp_fwd, _lookup_level_vjp_bwd)


def supported_shape(P: int, radius: int = 4) -> bool:
    """Static guards of the kernel's tiling: the pixel count must fill the
    T_PIX-pixel programs exactly (a non-divisible tail would be silently
    unwritten) and the bilinear window must fit the WN_PAD sublane pad
    (Wn = 2*radius+2 <= WN_PAD, i.e. radius <= 7)."""
    return P % T_PIX == 0 and 2 * radius + 2 <= WN_PAD


def corr_lookup_pallas(pyramid, coords: jnp.ndarray, radius: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for models.raft.corr_lookup_windowed.

    pyramid: list of [P, hl, wl, 1] f32 all-pairs maps (P = N*h*w);
    coords [N,h,w,2]. Returns [N,h,w,levels*(2r+1)^2] with the reference's
    x-major channel order (corr.py:37-43).

    Differentiation contract: gradients flow to the correlation maps ONLY;
    the coords cotangent is None (the XLA path also differentiates through
    the bilinear fx/fy). RAFT stop-gradients coords1 every GRU iteration
    (models/raft.py:447, matching the reference), so the two paths have
    identical training gradients; any OTHER caller differentiating through
    coords must use corr_lookup_windowed.
    """
    N, h, w, _ = coords.shape
    if not supported_shape(N * h * w, radius):
        raise ValueError(
            f"corr_lookup_pallas: P={N * h * w} (T_PIX={T_PIX}) or "
            f"radius={radius} (WN_PAD={WN_PAD}) outside the kernel tiling; "
            f"guard with supported_shape() and fall back to "
            f"corr_lookup_windowed")
    K = 2 * radius + 1
    out = []
    for i, corr in enumerate(pyramid):
        P = corr.shape[0]
        c = coords.reshape(P, 2) / (2 ** i)
        aux = _aux_from_coords(c)
        vals = _lookup_level(corr[..., 0].astype(jnp.float32), aux, radius,
                             interpret)                     # [P, dy, dx]
        out.append(vals.transpose(0, 2, 1).reshape(N, h, w, K * K))
    return jnp.concatenate(out, axis=-1)


_SUPPORTED = {}


def pallas_corr_supported(radius: int = 4) -> bool:
    """Probe once per radius: compile+run a tiny lookup at the CONFIGURED
    radius and compare with the XLA reference path (some remote Mosaic
    services reject parts of Pallas; a probe at a different radius would
    not exercise the same window tiling)."""
    if radius not in _SUPPORTED:
        try:
            if not supported_shape(T_PIX, radius):
                _SUPPORTED[radius] = False
                return False
            from mpiflow_tpu.models.raft import corr_lookup_windowed
            rng = np.random.RandomState(0)
            N, h, w = 1, 8, 16
            P = N * h * w
            corr = jnp.asarray(rng.randn(P, h, w, 1).astype(np.float32))
            coords = jnp.asarray(
                (rng.rand(N, h, w, 2) * [w - 1, h - 1]).astype(np.float32))
            got = corr_lookup_pallas([corr], coords, radius=radius)
            ref = corr_lookup_windowed([corr], coords, radius=radius)
            # bit-exact on hardware (one-hot selection + HIGHEST-precision
            # dots + identical bilinear expression)
            _SUPPORTED[radius] = bool(
                (np.asarray(got) == np.asarray(ref)).all())
        except Exception:  # pragma: no cover - environment dependent
            _SUPPORTED[radius] = False
    return _SUPPORTED[radius]
