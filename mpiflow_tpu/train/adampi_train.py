"""AdaMPI (CPN) training on warpback stage-2 pairs, TPU-native.

The reference ships only AdaMPI inference weights (adampi_64p.pth,
gen_3dphoto_dynamic_v2.py:52-60) but carries the full training-DATA
pipeline: warpback stage-2 synthesizes (src = inpainted novel view,
tgt = original view) supervision pairs precisely so an MPI predictor can
be trained by warp-back reconstruction (warpback/stage2_dataset.py,
SURVEY.md §2.2). This module supplies the missing training loop the
TPU-native way:

  stage-2 pair -> adampi_forward(src RGBD) -> render_novel_view at the
  warp-back pose (the SAME fused renderer the generator uses, src-blend
  included, utils/utils.py:202-204) -> reconstruction losses vs tgt.

Losses (the AdaMPI paper's recipe shape, arXiv:2205.11733 §3.4):
  * masked L1 on the rendered target RGB,
  * masked SSIM (uniform-window),
  * scale/shift-invariant L1 on rendered disparity vs the target
    disparity (MiDaS-style closed-form alignment — the stage-2 target
    disparity is an arbitrary-scale monocular estimate).

Training runs with frozen normalization statistics (BN folds to the
affine pair; buffers get zero optimizer updates exactly like
raft_train._is_buffer): from-scratch init sets mean=0/var=1 so BN is a
learnable affine, and fine-tuning a converted checkpoint keeps its
running stats — the freeze_bn convention of RAFT's fine-tune stages
(RAFT/train.py:146-148) applied to the MPI predictor.

The train step mirrors train/raft_train.py: one jitted program, sharded
over the mesh "data" axis as per-device shard_map programs with pmean'd
gradients.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mpiflow_tpu.models.adampi import adampi_forward
from mpiflow_tpu.render.mpi import render_novel_view
from mpiflow_tpu.train.raft_train import _is_buffer


@dataclasses.dataclass(frozen=True)
class AdaMPITrainConfig:
    num_planes: int = 64
    plane_chunk: int = 0          # 0 = fully batched planes
    lr: float = 1e-4
    wdecay: float = 1e-5
    clip: float = 1.0
    num_steps: int = 1000
    batch_size: int = 4
    w_rgb: float = 1.0
    w_ssim: float = 1.0
    w_disp: float = 1.0
    valid_frac: float = 0.99      # plane-coverage fraction for a valid px
    seed: int = 0
    name: str = "adampi"


# --------------------------------------------------------------- init
def he_adampi_params(seed: int = 0, manifest_path: Optional[str] = None
                     ) -> Dict[str, jnp.ndarray]:
    """From-scratch init at the PUBLISHED adampi_64p layout (the committed
    shape manifest, tests/golden/data/adampi.npz): He-normal conv/linear
    weights, zero biases, identity BN (weight=1, bias=0, mean=0, var=1).
    Unlike models.adampi.random_adampi_params (throughput-realistic random
    weights), this init is meant to be TRAINED."""
    import os
    if manifest_path is None:
        here = os.path.dirname(os.path.abspath(__file__))
        manifest_path = os.path.join(here, "..", "..", "tests", "golden",
                                     "data", "adampi.npz")
    g = np.load(manifest_path)
    rng = np.random.RandomState(seed)
    params = {}
    for k, shape_s in zip(g["sd_keys"], g["sd_shapes"]):
        k = str(k)
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        if k.endswith("num_batches_tracked") or len(shape) == 0:
            continue
        if k.endswith("running_mean"):
            v = np.zeros(shape, np.float32)
        elif k.endswith("running_var"):
            v = np.ones(shape, np.float32)
        elif len(shape) == 4:                        # conv OIHW
            fan_in = shape[1] * shape[2] * shape[3]
            v = (rng.randn(*shape) * np.sqrt(2.0 / fan_in)
                 ).astype(np.float32).transpose(2, 3, 1, 0)  # -> HWIO
        elif len(shape) == 2:                        # linear
            v = (rng.randn(*shape) * np.sqrt(2.0 / shape[1])
                 ).astype(np.float32)
        elif k.endswith(".weight"):                  # BN affine scale
            v = np.ones(shape, np.float32)
        else:                                        # biases
            v = np.zeros(shape, np.float32)
        params[k] = jnp.asarray(v)
    return params


def pixel_intrinsics(K_norm: np.ndarray, height: int, width: int
                     ) -> jnp.ndarray:
    """Normalized warpback intrinsics -> pixel units for the MPI renderer
    (the reference scales the same way, stage1_dataset.py:61-66)."""
    K = np.asarray(K_norm, np.float64).copy()
    K[0] *= width
    K[1] *= height
    return jnp.asarray(K, jnp.float32)


# --------------------------------------------------------------- losses
def ssim(x: jnp.ndarray, y: jnp.ndarray, window: int = 7,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Uniform-window SSIM map over [C,H,W] images in [0,1] -> [C,H,W]
    (SAME padding; the standard luminance*contrast*structure product)."""
    def blur(a):
        a = a[..., None]                                    # [C,H,W,1]
        k = jnp.ones((window, window, 1, 1), a.dtype) / (window * window)
        pad = window // 2
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    mx, my = blur(x), blur(y)
    vx = blur(x * x) - mx * mx
    vy = blur(y * y) - my * my
    cov = blur(x * y) - mx * my
    num = (2 * mx * my + c1) * (2 * cov + c2)
    den = (mx * mx + my * my + c1) * (vx + vy + c2)
    return num / den


def scale_shift_invariant_l1(pred: jnp.ndarray, tgt: jnp.ndarray,
                             mask: jnp.ndarray, eps: float = 1e-6
                             ) -> jnp.ndarray:
    """L1 after closed-form per-image scale/shift alignment of `pred` to
    `tgt` over `mask` (MiDaS eq. 3 least squares): the stage-2 target
    disparity has arbitrary scale, the rendered disparity is metric in
    plane units."""
    m = mask.astype(pred.dtype)
    n = jnp.maximum(m.sum(), 1.0)
    sp, st = (m * pred).sum() / n, (m * tgt).sum() / n
    spp = (m * pred * pred).sum() / n
    spt = (m * pred * tgt).sum() / n
    var = spp - sp * sp
    s = jnp.where(var > eps, (spt - sp * st) / jnp.maximum(var, eps), 1.0)
    b = st - s * sp
    # stop_gradient on the alignment: s,b are the measurement frame, not a
    # path for the network to game the loss through its own statistics
    s, b = jax.lax.stop_gradient(s), jax.lax.stop_gradient(b)
    return (m * jnp.abs(s * pred + b - tgt)).sum() / n


def adampi_sample_loss(params: Dict, src_rgb: jnp.ndarray,
                       src_disp: jnp.ndarray, tgt_rgb: jnp.ndarray,
                       tgt_disp: jnp.ndarray, G_tgt_src: jnp.ndarray,
                       K_pix: jnp.ndarray, cfg: AdaMPITrainConfig
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One stage-2 pair: predict MPI on src RGBD, render at the warp-back
    pose, compare to tgt. src_rgb/tgt_rgb [3,H,W] in [0,1]; disps [H,W];
    G_tgt_src = cam_ext from WarpbackStage2 (original <- novel)."""
    mpi_rgb, mpi_sigma, disparities = adampi_forward(
        params, src_rgb, src_disp, cfg.num_planes,
        plane_chunk=cfg.plane_chunk)
    nv = render_novel_view(mpi_rgb, mpi_sigma, disparities, G_tgt_src,
                           K_pix, K_pix, src_img=src_rgb, mode="scan")
    S = cfg.num_planes
    vmask = (nv.valid_sum / S >= cfg.valid_frac).astype(src_rgb.dtype)
    n = jnp.maximum(vmask.sum(), 1.0)

    l_rgb = (vmask[None] * jnp.abs(nv.frame - tgt_rgb)).sum() / (3 * n)
    ssim_map = ssim(nv.frame, tgt_rgb)
    l_ssim = (vmask[None] * (1.0 - ssim_map)).sum() / (2 * 3 * n)
    pred_disp = 1.0 / jnp.maximum(nv.depth, 1e-4)
    l_disp = scale_shift_invariant_l1(pred_disp, tgt_disp, vmask)

    loss = cfg.w_rgb * l_rgb + cfg.w_ssim * l_ssim + cfg.w_disp * l_disp
    mse = (vmask[None] * (nv.frame - tgt_rgb) ** 2).sum() / (3 * n)
    metrics = {"l_rgb": l_rgb, "l_ssim": l_ssim, "l_disp": l_disp,
               "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))}
    return loss, metrics


# --------------------------------------------------------------- step
def make_adampi_optimizer(cfg: AdaMPITrainConfig):
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(cfg.lr, weight_decay=cfg.wdecay),
    )
    return optax.multi_transform(
        {"train": tx, "buffer": optax.set_to_zero()},
        lambda params: {k: ("buffer" if _is_buffer(k) else "train")
                        for k in params})


def make_adampi_train_step(cfg: AdaMPITrainConfig, tx, K_pix: jnp.ndarray,
                           mesh=None, donate: bool = True):
    """Jitted DP train step over stage-2 batches (leading dim B, NCHW).

    With a mesh the step is per-device shard_map programs over the "data"
    axis with pmean'd grads/metrics — the same pattern as
    raft_train.make_train_step (and for the same reason: any opaque
    Pallas call in the forward needs no GSPMD rule when the program is
    already per-device)."""

    def loss_fn(params, src_rgb, src_disp, tgt_rgb, tgt_disp, G):
        losses, metrics = jax.vmap(
            lambda a, b, c, d, g: adampi_sample_loss(
                params, a, b, c, d, g, K_pix, cfg))(
                    src_rgb, src_disp, tgt_rgb, tgt_disp, G)
        return losses.mean(), jax.tree_util.tree_map(jnp.mean, metrics)

    def step(params, opt_state, src_rgb, src_disp, tgt_rgb, tgt_disp, G):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, src_rgb, src_disp, tgt_rgb,
                                   tgt_disp, G)
        if mesh is not None and mesh.devices.size > 1:
            from mpiflow_tpu.parallel.mesh import DATA_AXIS
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            metrics = jax.lax.pmean(metrics, DATA_AXIS)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(metrics, loss=loss)

    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P
        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"),
                      P("data")),
            out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(step, donate_argnums=(0, 1) if donate else ())
