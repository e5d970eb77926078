"""RAFT optical-flow model in JAX (the framework's downstream consumer).

Functional re-implementation of the reference fork (RAFT/core/raft.py,
extractor.py, corr.py, update.py) over torch-keyed parameter dicts, NHWC:

  * feature/context encoders (BasicEncoder instance/batch-norm variants,
    SmallEncoder bottleneck variant)            (extractor.py:6-267)
  * all-pairs correlation pyramid + windowed (2r+1)^2 bilinear lookup
    (corr.py:12-60). The reference ships a CUDA extension (alt_cuda_corr)
    computing only the lookup window to save memory; here
    `corr_lookup_alternate` computes the same windowed correlation with a
    gather + dot per level, entirely in XLA (SURVEY.md §2.3 TPU equivalent).
  * SepConvGRU update block with convex-upsampling mask (update.py:33-139)
  * the iterative refinement loop as lax.scan          (raft.py:86-144)

Weights from the published raft-things.pth / raft-kitti.pth convert via
mpiflow_tpu.models.torch_convert (nn.DataParallel "module." prefix stripped).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mpiflow_tpu.config import RAFTConfig
from mpiflow_tpu.models.nn import (
    P, batch_norm, conv2d, instance_norm, relu,
)

_HI = jax.lax.Precision.HIGHEST


# ----------------------------------------------------------------- norms
_BN_MOMENTUM = 0.1  # torch BatchNorm2d default


def _norm(x, p: P, name: str, kind: str, num_groups: int = 8,
          bn_state: Optional[Dict] = None):
    if kind == "none":
        return x
    if kind == "instance":
        return instance_norm(x)  # torch default affine=False
    if kind == "batch":
        if bn_state is not None:
            # torch BN train mode: normalize with batch stats; momentum-
            # update the running buffers (unbiased var, like torch).
            from mpiflow_tpu.models.nn import batch_norm_train
            out, mean, var = batch_norm_train(
                x, p.get(f"{name}.weight"), p.get(f"{name}.bias"))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            m = _BN_MOMENTUM
            rm, rv = p[f"{name}.running_mean"], p[f"{name}.running_var"]
            bn_state[p.key(f"{name}.running_mean")] = jax.lax.stop_gradient(
                (1 - m) * rm + m * mean.astype(rm.dtype))
            bn_state[p.key(f"{name}.running_var")] = jax.lax.stop_gradient(
                (1 - m) * rv + m * unbiased.astype(rv.dtype))
            return out
        return batch_norm(x, p[f"{name}.running_mean"],
                          p[f"{name}.running_var"],
                          p.get(f"{name}.weight"), p.get(f"{name}.bias"))
    if kind == "group":
        from mpiflow_tpu.models.nn import group_norm
        return group_norm(x, num_groups, p[f"{name}.weight"],
                          p[f"{name}.bias"])
    raise ValueError(kind)


# ------------------------------------------------------------- encoders
def _residual_block(x, p: P, kind: str, stride: int, bn_state=None):
    """extractor.py:6-56."""
    planes = p["conv1.weight"].shape[-1]
    y = conv2d(x, p["conv1.weight"], p["conv1.bias"], stride=stride, padding=1)
    y = relu(_norm(y, p, "norm1", kind, planes // 8, bn_state))
    y = conv2d(y, p["conv2.weight"], p["conv2.bias"], padding=1)
    y = relu(_norm(y, p, "norm2", kind, planes // 8, bn_state))
    if "downsample.0.weight" in p:
        x = conv2d(x, p["downsample.0.weight"], p["downsample.0.bias"],
                   stride=stride)
        # torch aliases norm3 as downsample.1; the downsample.1.* keys hold
        # the loaded values (they are written last by load_state_dict)
        x = _norm(x, p, "downsample.1", kind, planes // 8, bn_state)
    return relu(x + y)


def _bottleneck_block(x, p: P, kind: str, stride: int, bn_state=None):
    """extractor.py:60-116 (SmallEncoder)."""
    planes = p["conv3.weight"].shape[-1]
    y = conv2d(x, p["conv1.weight"], p["conv1.bias"])
    y = relu(_norm(y, p, "norm1", kind, planes // 8, bn_state))
    y = conv2d(y, p["conv2.weight"], p["conv2.bias"], stride=stride, padding=1)
    y = relu(_norm(y, p, "norm2", kind, planes // 8, bn_state))
    y = conv2d(y, p["conv3.weight"], p["conv3.bias"])
    y = relu(_norm(y, p, "norm3", kind, planes // 8, bn_state))
    if "downsample.0.weight" in p:
        x = conv2d(x, p["downsample.0.weight"], p["downsample.0.bias"],
                   stride=stride)
        x = _norm(x, p, "downsample.1", kind, planes // 8, bn_state)
    return relu(x + y)


def basic_encoder(params: Dict, x: jnp.ndarray, prefix: str, kind: str,
                  small: bool = False, bn_state=None) -> jnp.ndarray:
    """BasicEncoder/SmallEncoder (extractor.py:118-267). x: [N,H,W,3] in
    [-1,1]. Returns [N,H/8,W/8,output_dim]. With bn_state (a dict), batch
    norms run in train mode and write momentum-updated running stats into it."""
    p = P(params, prefix)
    block = _bottleneck_block if small else _residual_block
    x = conv2d(x, p["conv1.weight"], p["conv1.bias"], stride=2, padding=3)
    x = relu(_norm(x, p, "norm1", kind, 8, bn_state))
    for li, stride in ((1, 1), (2, 2), (3, 2)):
        x = block(x, p.sub(f"layer{li}.0."), kind, stride, bn_state)
        x = block(x, p.sub(f"layer{li}.1."), kind, 1, bn_state)
    return conv2d(x, p["conv2.weight"], p["conv2.bias"])


# ------------------------------------------------------------ correlation
def bilinear_sample_zeros(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """RAFT's bilinear_sampler (RAFT/core/utils/utils.py:57-71):
    grid_sample(align_corners=True, padding_mode='zeros') at raw pixel
    coords. img [N,H,W,C]; coords [N,...,2] (x,y). Returns [N,...,C]."""
    N, H, W, C = img.shape
    out_shape = coords.shape[1:-1]
    x = coords[..., 0].reshape(N, -1)
    y = coords[..., 1].reshape(N, -1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = yc * W + xc
        v = jnp.take_along_axis(img.reshape(N, H * W, C), idx[..., None],
                                axis=1)
        return v * (w * inb)[..., None]

    out = (tap(x0, y0, (1 - fx) * (1 - fy)) + tap(x0 + 1, y0, fx * (1 - fy))
           + tap(x0, y0 + 1, (1 - fx) * fy) + tap(x0 + 1, y0 + 1, fx * fy))
    return out.reshape((N,) + out_shape + (C,))


def all_pairs_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                           num_levels: int = 4):
    """CorrBlock.__init__ (corr.py:13-27): full H1W1 x H2W2 correlation,
    avg-pooled pyramid over the second pair of dims."""
    N, H, W, D = fmap1.shape
    corr = jnp.einsum("nxyd,nuvd->nxyuv", fmap1, fmap2, precision=_HI)
    corr = corr / jnp.sqrt(jnp.float32(D))
    corr = corr.reshape(N * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        c = pyramid[-1]
        h2, w2 = c.shape[1] // 2, c.shape[2] // 2
        c = c[:, :h2 * 2, :w2 * 2].reshape(-1, h2, 2, w2, 2, 1).mean((2, 4))
        pyramid.append(c)
    return pyramid


def corr_lookup(pyramid, coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """CorrBlock.__call__ (corr.py:29-50). coords [N,h,w,2] -> correlation
    features [N,h,w,num_levels*(2r+1)^2]."""
    N, h, w, _ = coords.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # NOTE channel-order quirk: the reference builds delta as
    # meshgrid(dy, dx) and adds it to (x, y) coords (corr.py:37-43), so the
    # FIRST meshgrid axis offsets x. Weight parity requires the same layout.
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)
    out = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(N * h * w, 1, 1, 2) / (2 ** i)
        coords_lvl = centroid + delta[None]
        sampled = bilinear_sample_zeros(corr, coords_lvl)    # [Nhw,2r+1,2r+1,1]
        out.append(sampled.reshape(N, h, w, -1))
    return jnp.concatenate(out, axis=-1)


def corr_lookup_windowed(pyramid, coords: jnp.ndarray,
                         radius: int) -> jnp.ndarray:
    """Row-window formulation of the corr lookup (same math as corr_lookup).

    The (2r+1)^2 bilinear samples per pixel share one fractional offset, so
    everything needed is a contiguous (2r+2)^2 window of the per-pixel corr
    map. XLA TPU gathers are index-rate bound, so instead of 4*(2r+1)^2
    point-gathers per pixel we gather 2r+2 ROWS per pixel (a 32x index
    reduction at r=4) and select the x-window in-register with a one-hot
    contraction; the backward is correspondingly a row scatter instead of
    324 point scatter-adds. This is the TPU counterpart of the reference's
    alt_cuda_corr CUDA kernel (SURVEY §2.3) with exact CorrBlock numerics.
    """
    N, h, w, _ = coords.shape
    r = radius
    K = 2 * r + 1
    Wn = K + 1                                                # window size
    out = []
    for i, corr in enumerate(pyramid):
        P, hl, wl, _ = corr.shape                             # P = N*h*w
        c = coords.reshape(P, 2) / (2 ** i)
        x, y = c[:, 0], c[:, 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(corr.dtype)
        fy = (y - y0).astype(corr.dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # gather the Wn rows [y0-r .. y0+r+1] of each pixel's map
        rows = y0i[:, None] - r + jnp.arange(Wn, dtype=jnp.int32)[None]
        row_ok = (rows >= 0) & (rows <= hl - 1)
        rows_c = jnp.clip(rows, 0, hl - 1)
        flat = corr.reshape(P * hl, wl)
        base = (jnp.arange(P, dtype=jnp.int32) * hl)[:, None]
        G = jnp.take(flat, (base + rows_c).reshape(-1), axis=0)
        G = G.reshape(P, Wn, wl) * row_ok[:, :, None].astype(corr.dtype)

        # select the Wn columns [x0-r .. x0+r+1] via a one-hot contraction
        cols = x0i[:, None] - r + jnp.arange(Wn, dtype=jnp.int32)[None]
        col_ok = (cols >= 0) & (cols <= wl - 1)
        onehot = (cols[:, None, :] ==
                  jnp.arange(wl, dtype=jnp.int32)[None, :, None])
        onehot = onehot.astype(corr.dtype) * col_ok[:, None, :].astype(corr.dtype)
        Wnd = jnp.einsum("pab,pbc->pac", G, onehot, precision=_HI)  # [P,Wn,Wn]

        # bilinear combine with the shared fractional offset
        w00 = ((1 - fy) * (1 - fx))[:, None, None]
        w01 = ((1 - fy) * fx)[:, None, None]
        w10 = (fy * (1 - fx))[:, None, None]
        w11 = (fy * fx)[:, None, None]
        vals = (Wnd[:, :K, :K] * w00 + Wnd[:, :K, 1:] * w01
                + Wnd[:, 1:, :K] * w10 + Wnd[:, 1:, 1:] * w11)  # [P,dy,dx]
        # reference channel order is x-major (its delta grid applies the
        # FIRST meshgrid axis to x; see corr_lookup) -> transpose (dy,dx)
        vals = vals.transpose(0, 2, 1)
        out.append(vals.reshape(N, h, w, K * K))
    return jnp.concatenate(out, axis=-1)


def corr_lookup_alternate(fmap1: jnp.ndarray, pyramid2, coords: jnp.ndarray,
                          radius: int) -> jnp.ndarray:
    """AlternateCorrBlock / alt_cuda_corr equivalent (corr.py:63-91,
    RAFT/alt_cuda_corr/correlation_kernel.cu): memory-efficient windowed
    correlation -- never materializes the H^2W^2 volume. For each pixel and
    each pyramid level, gathers the (2r+1)^2 neighborhood of fmap2 bilinearly
    and dots it with fmap1. pyramid2: list of [N,H_i,W_i,D] feature maps.
    """
    N, h, w, D = fmap1.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)
    K = (2 * r + 1) ** 2
    out = []
    for i, f2 in enumerate(pyramid2):
        centroid = coords.reshape(N, h * w, 1, 2) / (2 ** i)
        coords_lvl = (centroid + delta.reshape(1, 1, K, 2))  # [N,hw,K,2]
        nbr = bilinear_sample_zeros(f2, coords_lvl)          # [N,hw,K,D]
        corr = jnp.einsum("npd,npkd->npk", fmap1.reshape(N, h * w, D), nbr,
                          precision=_HI)
        out.append(corr.reshape(N, h, w, K))
    return jnp.concatenate(out, axis=-1) / jnp.sqrt(jnp.float32(D))


# ------------------------------------------------------------ update block
def _sep_conv_gru(h, x, p: P):
    """SepConvGRU (update.py:33-60): 1x5 then 5x1 GRU convolutions."""
    for suffix, pad in (("1", (0, 2)), ("2", (2, 0))):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(conv2d(hx, p[f"convz{suffix}.weight"],
                                  p[f"convz{suffix}.bias"], padding=pad))
        r = jax.nn.sigmoid(conv2d(hx, p[f"convr{suffix}.weight"],
                                  p[f"convr{suffix}.bias"], padding=pad))
        q = jnp.tanh(conv2d(jnp.concatenate([r * h, x], axis=-1),
                            p[f"convq{suffix}.weight"],
                            p[f"convq{suffix}.bias"], padding=pad))
        h = (1 - z) * h + z * q
    return h


def _conv_gru(h, x, p: P):
    """ConvGRU (update.py:16-31, small model)."""
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv2d(hx, p["convz.weight"], p["convz.bias"],
                              padding=1))
    r = jax.nn.sigmoid(conv2d(hx, p["convr.weight"], p["convr.bias"],
                              padding=1))
    q = jnp.tanh(conv2d(jnp.concatenate([r * h, x], axis=-1),
                        p["convq.weight"], p["convq.bias"], padding=1))
    return (1 - z) * h + z * q


def _motion_encoder(flow, corr, p: P, small: bool):
    """Basic/SmallMotionEncoder (update.py:62-97)."""
    if small:
        c = relu(conv2d(corr, p["convc1.weight"], p["convc1.bias"]))
        f = relu(conv2d(flow, p["convf1.weight"], p["convf1.bias"], padding=3))
        f = relu(conv2d(f, p["convf2.weight"], p["convf2.bias"], padding=1))
        out = relu(conv2d(jnp.concatenate([c, f], -1), p["conv.weight"],
                          p["conv.bias"], padding=1))
        return jnp.concatenate([out, flow], axis=-1)
    c = relu(conv2d(corr, p["convc1.weight"], p["convc1.bias"]))
    c = relu(conv2d(c, p["convc2.weight"], p["convc2.bias"], padding=1))
    f = relu(conv2d(flow, p["convf1.weight"], p["convf1.bias"], padding=3))
    f = relu(conv2d(f, p["convf2.weight"], p["convf2.bias"], padding=1))
    out = relu(conv2d(jnp.concatenate([c, f], -1), p["conv.weight"],
                      p["conv.bias"], padding=1))
    return jnp.concatenate([out, flow], axis=-1)


def _flow_head(x, p: P):
    y = relu(conv2d(x, p["conv1.weight"], p["conv1.bias"], padding=1))
    return conv2d(y, p["conv2.weight"], p["conv2.bias"], padding=1)


def update_block(params: Dict, net, inp, corr, flow, small: bool,
                 prefix: str = "update_block."):
    """Basic/SmallUpdateBlock (update.py:99-136). Returns (net, mask, dflow)."""
    p = P(params, prefix)
    mf = _motion_encoder(flow, corr, p.sub("encoder."), small)
    gru_in = jnp.concatenate([inp, mf], axis=-1)
    if small:
        net = _conv_gru(net, gru_in, p.sub("gru."))
        dflow = _flow_head(net, p.sub("flow_head."))
        return net, None, dflow
    net = _sep_conv_gru(net, gru_in, p.sub("gru."))
    dflow = _flow_head(net, p.sub("flow_head."))
    mask = conv2d(relu(conv2d(net, p["mask.0.weight"], p["mask.0.bias"],
                              padding=1)),
                  p["mask.2.weight"], p["mask.2.bias"]) * 0.25
    return net, mask, dflow


# -------------------------------------------------------------- upsampling
def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex upsampling (raft.py:72-83). flow [N,h,w,2], mask [N,h,w,576]
    -> [N,8h,8w,2]."""
    N, h, w, _ = flow.shape
    mask = mask.reshape(N, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nbrs = jnp.stack([fp[:, dy:dy + h, dx:dx + w] for dy in range(3)
                      for dx in range(3)], axis=3)          # [N,h,w,9,2]
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", mask, nbrs, precision=_HI)
    up = up.transpose(0, 1, 3, 2, 4, 5)                     # [N,h,8,w,8,2]
    return up.reshape(N, 8 * h, 8 * w, 2)


def upsample_flow_convex_block(flow: jnp.ndarray,
                               mask: jnp.ndarray) -> jnp.ndarray:
    """Convex upsampling kept in BLOCK layout: [N,h,w,2],[N,h,w,576]
    -> [N,h,w,64,2], where channel q = 8*a+b is subpixel (a,b) of input
    pixel (y,x). Equals pixel_to_block(upsample_flow_convex(flow, mask)).

    Training computes the sequence loss from 12 such predictions; keeping
    them in block layout skips the depth-to-space relayout of a full-res
    tensor 12x forward + 12x backward per step (the loss instead converts
    the ground truth ONCE, gradient-free). The loss is a sum of identical
    per-pixel terms either way. The reference cannot make this choice:
    torch's unfold-based upsample (raft.py:72-83) materializes pixel
    layout by construction."""
    N, h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(N, h, w, 9, 64), axis=3)
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nbrs = jnp.stack([fp[:, dy:dy + h, dx:dx + w] for dy in range(3)
                      for dx in range(3)], axis=3)          # [N,h,w,9,2]
    return jnp.einsum("nhwkq,nhwkc->nhwqc", m, nbrs, precision=_HI)


def pixel_to_block(x: jnp.ndarray) -> jnp.ndarray:
    """[N,8h,8w,*rest] -> [N,h,w,64,*rest]: inverse of block_to_pixel.
    Used on ground-truth flow/valid so the loss matches block-layout
    predictions; also accepts channel-free [N,8h,8w] (valid masks)."""
    N, H, W = x.shape[:3]
    rest = x.shape[3:]
    y = x.reshape((N, H // 8, 8, W // 8, 8) + rest)
    y = jnp.moveaxis(y, 2, 3)                    # [N,h,w,8,8,*rest]
    return y.reshape((N, H // 8, W // 8, 64) + rest)


def block_to_pixel(x: jnp.ndarray) -> jnp.ndarray:
    """[N,h,w,64,*rest] -> [N,8h,8w,*rest]."""
    N, h, w = x.shape[:3]
    rest = x.shape[4:]
    y = x.reshape((N, h, w, 8, 8) + rest)
    y = jnp.moveaxis(y, 3, 2)                    # [N,h,8,w,8,*rest]
    return y.reshape((N, 8 * h, 8 * w) + rest)


def upsample_flow_bilinear(flow: jnp.ndarray) -> jnp.ndarray:
    """upflow8 (RAFT/core/utils/utils.py:80-82): 8 * bilinear align_corners."""
    from mpiflow_tpu.models.nn import upsample_bilinear_align_corners
    N, h, w, _ = flow.shape
    return 8.0 * upsample_bilinear_align_corners(flow, 8 * h, 8 * w)


# ------------------------------------------------------------ full forward
def raft_forward(params: Dict, image1: jnp.ndarray, image2: jnp.ndarray,
                 cfg: RAFTConfig = RAFTConfig(), iters: int = 12,
                 flow_init: Optional[jnp.ndarray] = None,
                 compute_dtype=jnp.float32, with_low: bool = False,
                 bn_train: bool = False, block_up: bool = False):
    """RAFT.forward (raft.py:86-144). images [N,H,W,3] in [0,255].

    Returns flow predictions [iters,N,H,W,2] (full resolution).
    With `block_up` (training-only layout optimization), predictions stay
    in block layout [iters,N,h,w,64,2] = pixel_to_block of the above;
    requires the convex-upsample (non-small) model.
    With `with_low`, returns (flow_ups, flow_low) where flow_low is the
    final 1/8-res coords1-coords0 (raft.py:139-142 test_mode tuple).
    With `bn_train`, the context encoder's batch norms use batch statistics
    (torch BN train mode) and the return gains a dict of momentum-updated
    running stats: (flow_ups[, flow_low], new_bn_stats). The reference only
    freezes BN for stages other than chairs (RAFT/train.py:146-148), so
    from-scratch chairs training must run with bn_train=True.
    """
    if block_up and cfg.small:
        raise ValueError("block_up requires the convex-upsample model "
                         "(RAFT-small upsamples bilinearly)")
    N, H, W, _ = image1.shape
    h, w = H // 8, W // 8
    min_dim = 8 * 2 ** (cfg.corr_levels - 1)
    if H < min_dim or W < min_dim:
        raise ValueError(
            f"RAFT needs H,W >= {min_dim} for {cfg.corr_levels} correlation "
            f"levels (the coarsest 1/8-res pyramid level would be empty); "
            f"got {H}x{W}")
    hdim, cdim = cfg.hidden_dim, cfg.context_dim

    if cfg.mixed_precision and compute_dtype == jnp.float32:
        compute_dtype = jnp.bfloat16  # AMP equivalent (raft.py:99,110,127)
    if compute_dtype != jnp.float32:
        # params stay f32 (optimizer state); casts fuse into the convs
        cparams = {k: v.astype(compute_dtype) for k, v in params.items()}
    else:
        cparams = params

    x1 = (2.0 * (image1 / 255.0) - 1.0).astype(compute_dtype)
    x2 = (2.0 * (image2 / 255.0) - 1.0).astype(compute_dtype)

    fkind = "instance"
    ckind = "none" if cfg.small else "batch"
    both = jnp.concatenate([x1, x2], axis=0)
    fmaps = basic_encoder(cparams, both, "fnet.", fkind, cfg.small)
    fmap1 = fmaps[:N].astype(jnp.float32)
    fmap2 = fmaps[N:].astype(jnp.float32)

    bn_state: Optional[Dict] = {} if bn_train else None
    if bn_train:
        # train-mode BN runs in f32 on the original params (torch AMP also
        # keeps BN in fp32); the updated buffers write back into `params`
        cnet = basic_encoder(params, x1.astype(jnp.float32), "cnet.", ckind,
                             cfg.small, bn_state)
    else:
        cnet = basic_encoder(cparams, x1, "cnet.", ckind, cfg.small)
    net = jnp.tanh(cnet[..., :hdim]).astype(jnp.float32)
    inp = relu(cnet[..., hdim:hdim + cdim]).astype(jnp.float32)

    if cfg.alternate_corr:
        pyr2 = [fmap2]
        for _ in range(cfg.corr_levels - 1):
            f = pyr2[-1]
            h2, w2 = f.shape[1] // 2, f.shape[2] // 2
            pyr2.append(f[:, :h2 * 2, :w2 * 2]
                        .reshape(N, h2, 2, w2, 2, -1).mean((2, 4)))
        lookup = functools.partial(corr_lookup_alternate, fmap1, pyr2,
                                   radius=cfg.corr_radius)
    else:
        pyramid = all_pairs_corr_pyramid(fmap1, fmap2, cfg.corr_levels)
        use_pallas = use_fused = False
        # "pallas_interpret" forces the Pallas kernel through the
        # interpreter (runs on any backend; used by the CPU-mesh sharding
        # tests and dryrun_multichip to validate the kernel program under
        # shard_map partitioning without TPU hardware)
        interp = cfg.corr_impl == "pallas_interpret"
        if cfg.corr_impl in ("pallas", "pallas_interpret"):
            from mpiflow_tpu.ops.pallas_corr import (
                corr_lookup_pallas, corr_lookup_pallas_fused,
                fused_supported_shape, pad_pyramid_fused,
                pallas_corr_fused_supported, pallas_corr_supported,
                supported_shape)
            lvl_shapes = tuple((c.shape[1], c.shape[2]) for c in pyramid)
            # prefer the fused slice+gather kernel (one pallas_call for all
            # levels, no per-pixel matmuls); fall back to the matmul kernel,
            # then to the XLA row-window path
            use_fused = (fused_supported_shape(lvl_shapes, N * h * w,
                                               cfg.corr_radius)
                         and (interp
                              or pallas_corr_fused_supported(
                                  cfg.corr_radius)))
            use_pallas = (not use_fused
                          and supported_shape(N * h * w, cfg.corr_radius)
                          and (interp
                               or pallas_corr_supported(cfg.corr_radius)))
        if use_fused:
            # pad once, OUTSIDE the GRU scan: the padded maps (forward
            # reads) and unpadded maps (gradient carrier) become scan
            # constants and the 12 per-iteration lookups reuse them
            padded, pyr_f, lvl_shapes = pad_pyramid_fused(pyramid,
                                                          cfg.corr_radius)
            lookup = functools.partial(corr_lookup_pallas_fused, padded,
                                       pyr_f, lvl_shapes,
                                       radius=cfg.corr_radius,
                                       interpret=interp)
        elif use_pallas:
            lookup = functools.partial(corr_lookup_pallas, pyramid,
                                       radius=cfg.corr_radius,
                                       interpret=interp)
        else:
            lookup = functools.partial(corr_lookup_windowed, pyramid,
                                       radius=cfg.corr_radius)

    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (N, h, w, 2))
    coords1 = coords0 if flow_init is None else coords0 + flow_init

    def step(coords1_net, _):
        coords1, net = coords1_net
        coords1 = jax.lax.stop_gradient(coords1)
        corr = lookup(coords1)
        flow = coords1 - coords0
        if compute_dtype != jnp.float32:
            net, mask, dflow = update_block(
                cparams, net.astype(compute_dtype),
                inp.astype(compute_dtype), corr.astype(compute_dtype),
                flow.astype(compute_dtype), cfg.small)
            net = net.astype(jnp.float32)
            dflow = dflow.astype(jnp.float32)
            mask = None if mask is None else mask.astype(jnp.float32)
        else:
            net, mask, dflow = update_block(params, net, inp, corr, flow,
                                            cfg.small)
        coords1 = coords1 + dflow
        if mask is None:
            flow_up = upsample_flow_bilinear(coords1 - coords0)
        elif block_up:
            flow_up = upsample_flow_convex_block(coords1 - coords0, mask)
        else:
            flow_up = upsample_flow_convex(coords1 - coords0, mask)
        return (coords1, net), flow_up

    if getattr(cfg, "remat_gru", False):
        # recompute the iteration body in the backward instead of stashing
        # every iteration's intermediates (activation HBM traffic for
        # recompute FLOPs -- the step runs at ~1.4% MFU, so FLOPs are free)
        step = jax.checkpoint(step)
    (coords1, net), flow_ups = jax.lax.scan(step, (coords1, net), None,
                                            length=iters)
    if with_low and bn_train:
        return flow_ups, coords1 - coords0, bn_state
    if with_low:
        return flow_ups, coords1 - coords0
    if bn_train:
        return flow_ups, bn_state
    return flow_ups


def raft_test_mode(params, image1, image2, cfg=RAFTConfig(), iters: int = 24,
                   flow_init=None):
    """(flow_low [N,h,w,2], flow_up [N,H,W,2]) like test_mode (raft.py:139-142).
    flow_low is the true final 1/8-res coords1-coords0 that the reference
    feeds forward_interpolate for video warm start."""
    flow_ups, low = raft_forward(params, image1, image2, cfg, iters,
                                 flow_init, with_low=True)
    return low, flow_ups[-1]
