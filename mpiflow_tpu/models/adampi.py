"""AdaMPI multiplane-image predictor (CPN + PAN) as jitted JAX inference.

Functional re-implementation of the reference networks
(model/AdaMPI.py, model/CPN/{encoder,unet,decoder}.py, model/PAN.py) over
flat parameter dicts keyed by the torch state-dict names, so the published
`adampi_64p.pth` checkpoint loads directly through
mpiflow_tpu.models.torch_convert.

Pipeline (model/AdaMPI.py:55-78):
  plane disparities = linspace(1, 0.001, S+2)[1:-1]     (:64-68)
  feature_mask = FeatMaskNetwork(rgb, disp, disparities) (CPN/unet.py)
  feats        = ResnetEncoder(rgb, disp)                (CPN/encoder.py,
                                                          ResNet-18, RGBD stem)
  mpi          = DepthDecoder(feats, feature_mask)[full-res]
  DPN (PAN.py) is constructed but bypassed (:70-71); exposed via use_dpn.

Everything runs at B=1 with the plane dimension S folded into the batch axis
of the convs (the reference's (B*S, C, H, W) reshape), NHWC on TPU.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mpiflow_tpu.geom.homography import mpi_plane_disparities
from mpiflow_tpu.models.nn import (
    P, batch_norm, conv2d, conv_bn_act, elu, leaky_relu,
    linear, max_pool, relu, upsample_bilinear_align_corners, upsample_nearest,
    reflection_pad,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def decoder_key(parts: Tuple) -> str:
    """The reference's ModuleDict key: '-'.join(str(tuple)) joins the
    *characters* of the tuple's repr (model/CPN/decoder.py:73-75)."""
    return "-".join(str(parts))


# ----------------------------------------------------------- CPN encoder
def _basic_block(x, p: P, stride: int):
    """torchvision BasicBlock (ResNet-18/34)."""
    y = conv_bn_act(x, p, "conv1", "bn1", relu, stride=stride, padding=1)
    y = conv_bn_act(y, p, "conv2", "bn2", None, padding=1)
    if "downsample.0.weight" in p:
        x = conv2d(x, p["downsample.0.weight"], stride=stride)
        x = batch_norm(x, p["downsample.1.running_mean"],
                       p["downsample.1.running_var"],
                       p["downsample.1.weight"], p["downsample.1.bias"])
    return relu(x + y)


def resnet_encoder(params: Dict, rgb: jnp.ndarray, disp: jnp.ndarray,
                   prefix: str = "encoder.encoder.") -> List[jnp.ndarray]:
    """CPN ResnetEncoder (model/CPN/encoder.py:59-101): ResNet-18 with a
    4-channel RGBD stem; RGB ImageNet-normalized. NHWC in/out.

    rgb: [1,H,W,3] in [0,1]; disp: [1,H,W,1]. Returns 5 scales
    [conv1(H/2), layer1(H/4), layer2(H/8), layer3(H/16), layer4(H/32)].
    """
    p = P(params, prefix)
    x = ((rgb - IMAGENET_MEAN.astype(rgb.dtype))
         / IMAGENET_STD.astype(rgb.dtype))
    x = jnp.concatenate([x, disp], axis=-1)
    x = conv_bn_act(x, p, "conv1", "bn1", relu, stride=2, padding=3)
    conv1_out = x
    x = max_pool(x, 3, 2, 1)
    feats = [conv1_out]
    strides = {1: 1, 2: 2, 3: 2, 4: 2}
    for li in (1, 2, 3, 4):
        for bi in (0, 1):
            x = _basic_block(x, p.sub(f"layer{li}.{bi}."),
                             stride=strides[li] if bi == 0 else 1)
        feats.append(x)
    return feats


# ----------------------------------------------------------- CPN unet (FMN)
def feat_mask_network(params: Dict, rgb: jnp.ndarray, disp: jnp.ndarray,
                      disparities: jnp.ndarray, prefix: str = "fmn.",
                      plane_chunk: int = 0) -> jnp.ndarray:
    """FeatMaskNetwork (model/CPN/unet.py:18-69): per-plane 5-channel UNet,
    softmax over planes. rgb [1,H,W,3], disp [1,H,W,1], disparities [S].
    Returns feature_mask [S,H,W].

    This is the pipeline's biggest activation (the reference tiles the full-
    res input x S before conv, SURVEY §3.2); planes are INDEPENDENT until the
    final softmax, so `plane_chunk` > 0 processes them in chunks via lax.map
    (memory scales with chunk instead of S; 64-plane KITTI-res fits 16GB)."""
    p = P(params, prefix)
    S = disparities.shape[0]
    _, H, W, _ = rgb.shape
    disparities = disparities.astype(rgb.dtype)
    rgbd = jnp.concatenate([rgb, disp], axis=-1)                  # [1,H,W,4]

    def cbr(x, i, stride=1):
        return conv_bn_act(x, p, f"conv{i}.layer.0", f"conv{i}.layer.1",
                           relu, stride=stride, padding=1)

    # conv1 runs per plane on [k,H,W,5] = [rgbd | dval*ones]. An algebraic
    # factoring (conv1(x_s) = conv(rgbd) + dval_s*conv(ones), each run once)
    # was measured SLOWER on v5e (logs/bench_adampi_ab.log: 341.0 ms vs
    # 317.4 baseline) -- XLA already hoists the broadcast and fuses conv1
    # into the x-S batch, while the factored form adds an unfused
    # elementwise pass over the [S,H,W,16] output. Keep the direct form.
    def conv1_planes(dvals):                                  # [k] -> [k,H,W,16]
        x = jnp.broadcast_to(rgbd, (dvals.shape[0], H, W, 4))
        dchan = jnp.broadcast_to(dvals[:, None, None, None],
                                 (dvals.shape[0], H, W, 1))
        return cbr(jnp.concatenate([x, dchan], axis=-1), 1)

    def unet(c1):                                             # [b,H,W,16]
        c2 = cbr(c1, 2, stride=2)
        c3 = cbr(c2, 3, stride=2)
        c4 = cbr(c3, 4, stride=2)
        c5 = cbr(c4, 5)
        u5 = upsample_bilinear_align_corners(c5, c3.shape[1], c3.shape[2])
        c6 = cbr(jnp.concatenate([u5, c3], -1), 6)
        u6 = upsample_bilinear_align_corners(c6, c2.shape[1], c2.shape[2])
        c7 = cbr(jnp.concatenate([u6, c2], -1), 7)
        u7 = upsample_bilinear_align_corners(c7, c1.shape[1], c1.shape[2])
        c8 = cbr(jnp.concatenate([u7, c1], -1), 8)
        return cbr(c8, 9)                                         # [b,H,W,1]

    if plane_chunk and plane_chunk < S:
        assert S % plane_chunk == 0, (S, plane_chunk)
        chunks = disparities.reshape(S // plane_chunk, plane_chunk)
        # conv1_base/dmap are closed over: computed once, reused per chunk
        c9 = jax.lax.map(lambda d: unet(conv1_planes(d)), chunks)
        c9 = c9.reshape(S, H, W, 1)
    else:
        c9 = unet(conv1_planes(disparities))
    return jax.nn.softmax(c9[..., 0], axis=0)                     # over planes


# ----------------------------------------------------------- CPN decoder
def _gated_conv(x, p: P):
    """GatedConv (decoder.py:23-37): reflection pad + conv * sigmoid(mask).

    Two separate convs on the shared padded input. Fusing them into one
    conv (kernels concatenated along output channels, then split) was
    measured SLOWER on v5e (logs/bench_adampi_ab.log: 323.6 ms vs 317.4
    baseline) -- the post-conv channel split lands on non-lane-aligned
    boundaries and blocks XLA's conv+elementwise fusion. Keep two convs."""
    x = reflection_pad(x, 1)
    f = conv2d(x, p["conv2d.weight"], p["conv2d.bias"])
    m = conv2d(x, p["mask_conv2d.weight"], p["mask_conv2d.bias"])
    return f * jax.nn.sigmoid(m)


def _gated_conv_block(x, p: P):
    """GatedConvBlock (decoder.py:40-51): gated conv -> BN -> ELU."""
    x = _gated_conv(x, p.sub("gated_conv."))
    x = batch_norm(x, p["bn.running_mean"], p["bn.running_var"],
                   p["bn.weight"], p["bn.bias"])
    return elu(x)


def _conv_block(x, p: P, name: str, padding: int):
    """decoder.py:54-69 `conv`: Conv2d(bias=False) + BN + LeakyReLU(0.1)."""
    x = conv2d(x, p[f"{name}.0.weight"], padding=padding)
    x = batch_norm(x, p[f"{name}.1.running_mean"], p[f"{name}.1.running_var"],
                   p[f"{name}.1.weight"], p[f"{name}.1.bias"])
    return leaky_relu(x, 0.1)


def depth_decoder(params: Dict, enc_feats: List[jnp.ndarray],
                  feature_mask: jnp.ndarray, prefix: str = "decoder.",
                  scales=(0, 1, 2, 3), plane_chunk: int = 0):
    """DepthDecoder (model/CPN/decoder.py:72-174) at B=1, S planes.

    enc_feats: 5 NHWC scales with leading dim 1; feature_mask [S,H,W].
    Returns multi-scale MPIs, index 0 = full resolution [S,H,W,4]
    (rgb sigmoid, sigma relu(out*cum_mask)+1e-4).

    Planes are independent given the (shared) encoder features and the
    per-plane context masks; `plane_chunk` > 0 maps over plane chunks to
    bound activation memory (full-res gated-conv activations are ~1.5GB at
    64-plane KITTI res otherwise). NOTE: chunking returns only the full-res
    scale (a list with one element).
    """
    if plane_chunk and plane_chunk < feature_mask.shape[0]:
        S = feature_mask.shape[0]
        assert S % plane_chunk == 0, (S, plane_chunk)
        fm_chunks = feature_mask.reshape(S // plane_chunk, plane_chunk,
                                         *feature_mask.shape[1:])
        # context masks depend on the cumulative mask across ALL planes, so
        # compute cum/context upfront and chunk those
        fm = feature_mask[None]
        cum_mask = jnp.cumsum(fm, axis=1)
        inpaint_mask = jnp.concatenate(
            [jnp.zeros_like(cum_mask[:, -1:]), cum_mask[:, :-1]], axis=1)
        context_mask = (1.0 - inpaint_mask)[0]                  # [S,H,W]
        cum = cum_mask[0]

        def one_chunk(args):
            fm_c, ctx_c, cum_c = args
            return _decoder_planes(params, enc_feats, fm_c, ctx_c, cum_c,
                                   prefix, scales=(0,))[0]

        k = plane_chunk
        outs = jax.lax.map(one_chunk, (
            fm_chunks,
            context_mask.reshape(S // k, k, *context_mask.shape[1:]),
            cum.reshape(S // k, k, *cum.shape[1:])))
        return [outs.reshape(S, *outs.shape[2:])]

    fm = feature_mask[None]
    cum_mask = jnp.cumsum(fm, axis=1)
    inpaint_mask = jnp.concatenate(
        [jnp.zeros_like(cum_mask[:, -1:]), cum_mask[:, :-1]], axis=1)
    context_mask = (1.0 - inpaint_mask)[0]
    return _decoder_planes(params, enc_feats, feature_mask, context_mask,
                           cum_mask[0], prefix, scales)


def _decoder_planes(params: Dict, enc_feats: List[jnp.ndarray],
                    feature_mask: jnp.ndarray, context_mask: jnp.ndarray,
                    cum_mask: jnp.ndarray, prefix: str = "decoder.",
                    scales=(0, 1, 2, 3)) -> List[jnp.ndarray]:
    """Decoder body for a set of planes with precomputed context masks.
    feature_mask/context_mask/cum_mask: [S,H,W]."""
    p = P(params, prefix)
    S = feature_mask.shape[0]

    # receptive-field extension (decoder.py:127-131)
    enc_out = enc_feats[-1]
    x = _conv_block(max_pool(enc_out, 3, 2, 1), p, "conv_down1", 0)
    x = _conv_block(max_pool(x, 3, 2, 1), p, "conv_down2", 1)
    x = _conv_block(upsample_nearest(x), p, "conv_up1", 1)
    conv_up2 = _conv_block(upsample_nearest(x), p, "conv_up2", 0)

    from mpiflow_tpu.ops.resample import adaptive_avg_pool2d as pool_hw

    def tile_with_masks(feat):
        """(decoder.py:139-152): feat [1,h,w,C] -> [S,h,w,C+2] with the
        (precomputed) context/feature masks pooled to (h,w)."""
        h, w = feat.shape[1], feat.shape[2]
        ctx = pool_hw(context_mask, h, w)[..., None]                # [S,h,w,1]
        fmk = pool_hw(feature_mask, h, w)[..., None]
        tiled = jnp.broadcast_to(feat, (S,) + feat.shape[1:])
        return jnp.concatenate([tiled * ctx, ctx, fmk], axis=-1)

    x = tile_with_masks(conv_up2)
    skips = [tile_with_masks(f) for f in enc_feats]

    outputs = []
    for i in range(4, -1, -1):
        x = _gated_conv_block(x, p.sub(f"convs.{decoder_key(('upconv', i, 0))}."))
        x = upsample_nearest(x)
        if i > 0:
            x = jnp.concatenate([x, skips[i - 1]], axis=-1)
        x = _gated_conv_block(x, p.sub(f"convs.{decoder_key(('upconv', i, 1))}."))
        if i in scales:
            out = _gated_conv(x, p.sub(f"convs.{decoder_key(('dispconv', i))}."))
            h, w = out.shape[1], out.shape[2]
            cur_mask = pool_hw(cum_mask, h, w)[..., None]
            rgb = jax.nn.sigmoid(out[..., 0:3])
            sigma = relu(out[..., 3:4] * cur_mask) + 1e-4
            outputs.append(jnp.concatenate([rgb, sigma], axis=-1))
    return outputs[::-1]


# ----------------------------------------------------------- PAN / DPN
def depth_prediction_network(params: Dict, init_disp: jnp.ndarray,
                             rgb_low: jnp.ndarray, disp_low: jnp.ndarray,
                             prefix: str = "dpn.") -> jnp.ndarray:
    """DepthPredictionNetwork (model/PAN.py:80-109): per-plane disparity
    adjustment via a downsize CNN + 4-head self-attention over planes.
    Bypassed in the reference forward (model/AdaMPI.py:70-71) but exposed
    for the full AdaMPI capability surface.

    init_disp [S]; rgb_low [1,h,w,3]; disp_low [1,h,w,1]. Returns [S]."""
    p = P(params, prefix)
    S = init_disp.shape[0]
    h, w = rgb_low.shape[1], rgb_low.shape[2]
    rgbd = jnp.concatenate([rgb_low, disp_low], axis=-1)
    x = jnp.broadcast_to(rgbd, (S, h, w, 4))
    dchan = jnp.broadcast_to(init_disp[:, None, None, None], (S, h, w, 1))
    x = jnp.concatenate([x, dchan], axis=-1)                   # [S,h,w,5]

    # DownsizeEncoder: 5 ResBlocks each followed by 2x2 avg pool (PAN.py:31-46)
    for i in range(5):
        bp = p.sub(f"context_encoder.res_blocks.{i}.")
        y = conv2d(x, bp["conv1.weight"], bp["conv1.bias"], padding=1)
        y = relu(y)
        y = batch_norm(y, bp["bn.running_mean"], bp["bn.running_var"],
                       bp["bn.weight"], bp["bn.bias"])
        y = conv2d(y, bp["conv2.weight"], bp["conv2.bias"], padding=1)
        sc = conv2d(x, bp["conv3.weight"], bp["conv3.bias"])
        x = relu(sc + y)
        N, H2, W2, C = x.shape
        x = x.reshape(N, H2 // 2, 2, W2 // 2, 2, C).mean(axis=(2, 4))

    ctx = x.mean(axis=(1, 2))                                  # [S,C] (GAP)
    ctx = ctx[None]                                            # [1,S,C]

    # 4-head self-attention over the plane axis (PAN.py:49-66)
    heads = []
    for hi in range(4):
        Q = linear(ctx, p[f"self_attention.wQs.{hi}.weight"],
                   p[f"self_attention.wQs.{hi}.bias"])
        K = linear(ctx, p[f"self_attention.wKs.{hi}.weight"],
                   p[f"self_attention.wKs.{hi}.bias"])
        V = linear(ctx, p[f"self_attention.wVs.{hi}.weight"],
                   p[f"self_attention.wVs.{hi}.bias"])
        att = jax.nn.softmax(
            jnp.einsum("bik,bjk->bij", Q, K,
                       precision=jax.lax.Precision.HIGHEST)
            / np.sqrt(Q.shape[-1]), axis=2)
        heads.append(jnp.einsum("bij,bjc->bic", att, V,
                                precision=jax.lax.Precision.HIGHEST))
    feat = linear(jnp.concatenate(heads, axis=-1),
                  p["self_attention.fusion.weight"],
                  p["self_attention.fusion.bias"])
    feat = relu(linear(feat, p["embed.0.weight"], p["embed.0.bias"]))
    off = linear(feat, p["to_disp.linear.weight"],
                 p["to_disp.linear.bias"])[0, :, 0]            # [S]
    return init_disp + off / S


# ----------------------------------------------------------- full predictor
def adampi_forward(params: Dict, image: jnp.ndarray, disp: jnp.ndarray,
                   num_planes: int, use_dpn: bool = False,
                   plane_chunk: int = 0):
    """MPIPredictor.forward (model/AdaMPI.py:55-78).

    image [3,H,W] in [0,1]; disp [H,W]. Returns
    (mpi_rgb [S,3,H,W], mpi_sigma [S,1,H,W], disparities [S]).
    plane_chunk bounds the FMN/decoder activation memory (see those fns).
    """
    H, W = image.shape[1], image.shape[2]
    rgb = image.transpose(1, 2, 0)[None]                       # [1,H,W,3]
    d = disp[None, :, :, None]                                 # [1,H,W,1]
    disparities = jnp.asarray(mpi_plane_disparities(num_planes))

    if use_dpn:
        low_h, low_w = H // 4, W // 4
        rgb_low = upsample_bilinear_align_corners(rgb, low_h, low_w)
        disp_low = upsample_bilinear_align_corners(d, low_h, low_w)
        disparities = depth_prediction_network(params, disparities, rgb_low,
                                               disp_low)

    fm = feat_mask_network(params, rgb, d, disparities,
                           plane_chunk=plane_chunk)            # [S,H,W]
    feats = resnet_encoder(params, rgb, d)
    mpi = depth_decoder(params, feats, fm,
                        plane_chunk=plane_chunk)[0]            # [S,H,W,4]
    mpi = mpi.transpose(0, 3, 1, 2)                            # [S,4,H,W]
    return mpi[:, 0:3], mpi[:, 3:4], disparities


def random_adampi_params(dtype=jnp.bfloat16, manifest_path: str = None,
                         seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Randomized parameters at the PUBLISHED adampi_64p layout, from the
    committed shape manifest (tests/golden/data/adampi.npz; shapes are
    resolution- and plane-count-independent). The real checkpoint is
    stripped from the reference snapshot (.MISSING_LARGE_BLOBS) and
    unfetchable here; throughput is determined by the compute graph, not
    the weight values, so bench.py, __graft_entry__ and the
    `--predictor adampi_random` CLI paths share this."""
    import os
    if manifest_path is None:
        here = os.path.dirname(os.path.abspath(__file__))
        manifest_path = os.path.join(here, "..", "..", "tests", "golden",
                                     "data", "adampi.npz")
    g = np.load(manifest_path)
    rng = np.random.RandomState(seed)
    params = {}
    for k, shape_s in zip(g["sd_keys"], g["sd_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        if str(k).endswith("num_batches_tracked") or len(shape) == 0:
            continue
        if str(k).endswith("running_var"):
            v = (0.5 + rng.rand(*shape)).astype(np.float32)
        else:
            v = (rng.randn(*shape) * 0.1).astype(np.float32)
        if len(shape) == 4:
            v = v.transpose(2, 3, 1, 0)     # OIHW -> HWIO
        params[str(k)] = jnp.asarray(v, dtype)
    return params


def make_random_adampi_predictor(width: int, height: int,
                                 num_planes: int = 64,
                                 plane_chunk: int = 64,
                                 compute_dtype=jnp.bfloat16,
                                 seed: int = 0):
    """An MPIPredictFn with random weights at the published layout: the
    throughput-realistic generation path when real weights are absent."""
    del width, height  # the functional forward is shape-polymorphic
    params = random_adampi_params(compute_dtype, seed=seed)

    def predict(image, disp):
        rgb, sigma, _ = adampi_forward(
            params, image.astype(compute_dtype), disp.astype(compute_dtype),
            num_planes, plane_chunk=plane_chunk)
        return rgb.astype(jnp.float32), sigma.astype(jnp.float32)

    return predict


def load_adampi_predictor(ckpt_path: str, width: int, height: int,
                          use_dpn: bool = False, plane_chunk: int = 64,
                          compute_dtype=jnp.bfloat16):
    """Load adampi_64p.pth (keys {'num_planes','weight'},
    gen_3dphoto_dynamic_v2.py:52-58) and return an MPIPredictFn for the
    generation pipeline: (image [3,H,W], disp [H,W]) ->
    (mpi_rgb [S,3,H,W], mpi_sigma [S,1,H,W]).

    compute_dtype defaults to bfloat16: the reference itself runs the
    network in fp16 (gen_3dphoto_dynamic_v2.py:59), and v5e convs are ~8x
    faster in bf16. Pass jnp.float32 for parity testing; compositing
    downstream is always fp32.

    plane_chunk=64 runs the standard 64-plane model fully batched (no
    lax.map chunking): measured 2x faster than chunk=16 on v5e and fits a
    16GB chip at KITTI res in bf16. Lower it for larger resolutions or
    higher plane counts."""
    from mpiflow_tpu.models.torch_convert import load_torch_checkpoint
    ckpt = load_torch_checkpoint(ckpt_path)
    num_planes = int(ckpt.get("num_planes", 64))
    if ckpt_path.endswith(".npz"):
        # .npz archives (cli/convert_ckpt, train/adampi_train checkpoints)
        # are ALREADY in the converted HWIO layout -- converting again
        # would transpose conv weights a second time
        params = {k: np.asarray(v) for k, v in ckpt["weight"].items()
                  if not k.endswith("num_batches_tracked")}
    else:
        from mpiflow_tpu.models.torch_convert import convert_state_dict
        params = convert_state_dict(ckpt["weight"])
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, compute_dtype), params)

    def predict(image, disp):
        rgb, sigma, _ = adampi_forward(
            params, image.astype(compute_dtype), disp.astype(compute_dtype),
            num_planes, use_dpn=use_dpn, plane_chunk=plane_chunk)
        return rgb.astype(jnp.float32), sigma.astype(jnp.float32)

    return predict
