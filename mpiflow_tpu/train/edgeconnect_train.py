"""EdgeConnect stage-1 adversarial training, TPU-native.

The reference only CONSUMES pretrained EdgeConnect weights
(warpback/networks.py:11-26 loads `ecweight/{EdgeModel_gen, InpaintingModel_gen,
InpaintingModel_disp}.pth`); the training loop behind those weights was never
shipped. This module closes that gap: the edge / RGB-inpaint / disparity-inpaint
generators train adversarially on WarpbackStage1 (image, disp, hole-mask)
triples, per the EdgeConnect recipe (Nazeri et al. 2019) the published weights
come from:

  * EdgeModel: non-saturating GAN loss + discriminator feature-matching (x10),
    discriminator conditioned on [gray, edge].
  * InpaintModel: hole-normalized L1 (x1) + adversarial (x0.1) + perceptual
    (x0.1) + Gram-matrix style (x250).
  * Disparity model: the InpaintModel recipe on 1-channel disparity.

Deviations, by necessity and design (documented, not hidden):
  * Perceptual/style features come from a FIXED random conv pyramid instead of
    pretrained VGG19 -- the VGG weights are unfetchable here (no egress), and
    random-filter features are an established substitute for perceptual
    distances (Ulyanov et al., "Deep Image Prior"). The pyramid is seeded and
    constant-folded into the jitted step.
  * Generator spectral norm is omitted (the published checkpoints materialize
    it into plain weights anyway -- see models/torch_convert); discriminator
    spectral norm, the one that matters for GAN stability, is implemented with
    persistent one-step power iteration (models/edgeconnect.spectral_normalize).

Both generator and discriminator update from the same jitted step
(simultaneous updates, grads pmean'd over the mesh "data" axis under
shard_map -- the same DP pattern as train/raft_train.py). Checkpoints are the
exact `ec_params` tree ({edge, inpaint, disp}) that warpback.datasets'
stage-2 synthesizer loads.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mpiflow_tpu.models.edgeconnect import (
    discriminator, edge_generator, inpaint_generator,
    random_discriminator_params,
)
from mpiflow_tpu.ops.canny import canny_edges

# EdgeConnect defaults (checkpoints/config.yml.example in the upstream repo)
LR = 1e-4
D2G_LR = 0.1
BETA1, BETA2 = 0.0, 0.9
FM_WEIGHT = 10.0
L1_WEIGHT = 1.0
ADV_WEIGHT = 0.1
PERC_WEIGHT = 0.1
STYLE_WEIGHT = 250.0


def _bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Non-saturating GAN loss: BCE-with-logits against a constant label."""
    t = jnp.full_like(logits, target)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, t))


def _fixed_pyramid_weights(in_ch: int, seed: int = 7, depth: int = 3,
                           width: int = 64):
    """Fixed (non-trainable) random conv filters for perceptual/style
    features; constants under jit."""
    rng = np.random.RandomState(seed)
    ws = []
    cin = in_ch
    for _ in range(depth):
        fan = 3 * 3 * cin
        ws.append(jnp.asarray(rng.randn(3, 3, cin, width).astype("float32")
                              * (2.0 / fan) ** 0.5))
        cin = width
    return ws


def _pyramid_features(x: jnp.ndarray, ws) -> list:
    from mpiflow_tpu.models.nn import conv2d
    feats = []
    y = x
    for w in ws:
        y = jax.nn.relu(conv2d(y, w, stride=2, padding=1))
        feats.append(y)
    return feats


def _gram(f: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = f.shape
    m = f.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", m, m) / (h * w * c)


def perceptual_style_losses(fake: jnp.ndarray, real: jnp.ndarray,
                            hole: jnp.ndarray, ws) -> Tuple[jnp.ndarray,
                                                            jnp.ndarray]:
    """(perceptual, style) on the fixed pyramid. fake/real NHWC,
    hole [N,H,W] (1 = missing). Style compares hole regions only,
    matching EdgeConnect's style_loss(outputs*mask, images*mask)."""
    f_feats = _pyramid_features(fake, ws)
    r_feats = _pyramid_features(real, ws)
    perc = sum(jnp.mean(jnp.abs(f - r))
               for f, r in zip(f_feats, r_feats)) / len(ws)
    hole4 = hole[..., None]
    fh = _pyramid_features(fake * hole4, ws)
    rh = _pyramid_features(real * hole4, ws)
    style = sum(jnp.mean(jnp.abs(_gram(f) - _gram(r)))
                for f, r in zip(fh, rh)) / len(ws)
    return perc, style


def _gray(rgb_nchw: jnp.ndarray) -> jnp.ndarray:
    """torchvision Grayscale coefficients (stage2_dataset.py:114)."""
    return (0.2989 * rgb_nchw[:, 0] + 0.587 * rgb_nchw[:, 1]
            + 0.114 * rgb_nchw[:, 2])


def prepare_edge_batch(rgb: jnp.ndarray, mask: jnp.ndarray):
    """gray [N,H,W], gt edge map, and the generator input
    [gray*mask, edge*mask, hole] (EdgeModel's conditioning)."""
    gray = _gray(rgb)
    edge = jax.vmap(lambda g, m: canny_edges(g, sigma=2.0, mask=m))(
        gray, mask)
    hole = 1.0 - mask
    gen_in = jnp.stack([gray * mask, edge * mask, hole], axis=-1)
    return gray, edge, gen_in


@dataclasses.dataclass
class ECState:
    gen_params: Dict
    disc_params: Dict
    gen_opt: optax.OptState
    disc_opt: optax.OptState
    step: int = 0


class ECTrainer:
    """One adversarial trainer per model kind ('edge', 'inpaint', 'disp')."""

    def __init__(self, kind: str, lr: float = LR, mesh=None,
                 gen_prefix: str = ""):
        assert kind in ("edge", "inpaint", "disp")
        self.kind = kind
        self.mesh = mesh
        self.gen_tx = optax.adam(lr, b1=BETA1, b2=BETA2)
        self.disc_tx = optax.adam(lr * D2G_LR, b1=BETA1, b2=BETA2)
        # disc conditioning channels: edge D sees [gray, edge];
        # inpaint D sees RGB; disp D sees disparity
        self.disc_in_ch = {"edge": 2, "inpaint": 3, "disp": 1}[kind]
        self._pyr_ws = _fixed_pyramid_weights(
            {"edge": 2, "inpaint": 3, "disp": 1}[kind])
        self.gen_prefix = gen_prefix
        self.step_fn = self._build_step()

    # -- loss definitions ------------------------------------------------
    def _edge_losses(self, gen_params, disc_params, rgb, disp, mask):
        gray, edge_gt, gen_in = prepare_edge_batch(rgb, mask)
        fake = edge_generator(gen_params, gen_in,
                              prefix=self.gen_prefix)[..., 0]     # [N,H,W]
        d_real_in = jnp.stack([gray, edge_gt], axis=-1)
        d_fake_in = jnp.stack([gray, fake], axis=-1)
        real_logits, real_feats, new_u = discriminator(disc_params, d_real_in)
        fake_logits, fake_feats, _ = discriminator(
            disc_params, jax.lax.stop_gradient(d_fake_in))
        d_loss = 0.5 * (_bce_logits(real_logits, 1.0)
                        + _bce_logits(fake_logits, 0.0))
        g_logits, g_feats, _ = discriminator(
            jax.tree_util.tree_map(jax.lax.stop_gradient, disc_params),
            d_fake_in)
        g_adv = _bce_logits(g_logits, 1.0)
        g_fm = sum(jnp.mean(jnp.abs(gf - jax.lax.stop_gradient(rf)))
                   for gf, rf in zip(g_feats[:-1], real_feats[:-1]))
        g_loss = g_adv + FM_WEIGHT * g_fm
        metrics = {"g_adv": g_adv, "g_fm": g_fm, "d_loss": d_loss,
                   "edge_l1": jnp.mean(jnp.abs(fake - edge_gt))}
        return g_loss, d_loss, metrics, new_u

    def _inpaint_losses(self, gen_params, disc_params, rgb, disp, mask):
        hole = 1.0 - mask
        gray, edge_gt, _ = prepare_edge_batch(rgb, mask)
        if self.kind == "inpaint":
            target_nhwc = rgb.transpose(0, 2, 3, 1)               # [N,H,W,3]
            masked = target_nhwc * mask[..., None] + hole[..., None]
            gen_in = jnp.concatenate([masked, edge_gt[..., None]], axis=-1)
        else:                                                     # disp
            target_nhwc = disp[..., None]                          # [N,H,W,1]
            masked = (disp * mask + hole)[..., None]
            gen_in = jnp.concatenate([masked, edge_gt[..., None]], axis=-1)
        fake = inpaint_generator(gen_params, gen_in,
                                 prefix=self.gen_prefix)
        if self.kind == "disp":
            fake = fake[..., :1]
        real_logits, _, new_u = discriminator(disc_params, target_nhwc)
        fake_logits, _, _ = discriminator(disc_params,
                                          jax.lax.stop_gradient(fake))
        d_loss = 0.5 * (_bce_logits(real_logits, 1.0)
                        + _bce_logits(fake_logits, 0.0))
        g_logits, _, _ = discriminator(
            jax.tree_util.tree_map(jax.lax.stop_gradient, disc_params), fake)
        g_adv = _bce_logits(g_logits, 1.0) * ADV_WEIGHT
        # hole-normalized L1 (EdgeConnect: l1(outputs, images) / mean(masks))
        g_l1 = (jnp.mean(jnp.abs(fake - target_nhwc))
                / jnp.maximum(jnp.mean(hole), 1e-3)) * L1_WEIGHT
        perc, style = perceptual_style_losses(fake, target_nhwc, hole,
                                              self._pyr_ws)
        g_loss = g_adv + g_l1 + PERC_WEIGHT * perc + STYLE_WEIGHT * style
        metrics = {"g_adv": g_adv, "g_l1": g_l1, "g_perc": perc,
                   "g_style": style, "d_loss": d_loss}
        return g_loss, d_loss, metrics, new_u

    # -- jitted step -----------------------------------------------------
    def _build_step(self):
        losses = (self._edge_losses if self.kind == "edge"
                  else self._inpaint_losses)
        self.losses = losses        # exposed for gradient-comparing tests
        mesh = self.mesh

        def g_only(gen_params, disc_params, rgb, disp, mask):
            g_loss, _, metrics, _ = losses(gen_params, disc_params,
                                           rgb, disp, mask)
            return g_loss, metrics

        def d_only(disc_params, gen_params, rgb, disp, mask):
            _, d_loss, _, new_u = losses(gen_params, disc_params,
                                         rgb, disp, mask)
            return d_loss, new_u

        def step(gen_params, disc_params, gen_opt, disc_opt,
                 rgb, disp, mask):
            (g_loss, metrics), g_grads = jax.value_and_grad(
                g_only, has_aux=True)(gen_params, disc_params,
                                      rgb, disp, mask)
            (d_loss, new_u), d_grads = jax.value_and_grad(
                d_only, has_aux=True)(disc_params, gen_params,
                                      rgb, disp, mask)
            if mesh is not None and mesh.devices.size > 1:
                from mpiflow_tpu.parallel.mesh import DATA_AXIS
                g_grads = jax.lax.pmean(g_grads, DATA_AXIS)
                d_grads = jax.lax.pmean(d_grads, DATA_AXIS)
                metrics = jax.lax.pmean(metrics, DATA_AXIS)
                new_u = jax.lax.pmean(new_u, DATA_AXIS)
            # u vectors are power-iteration state, not trainable weights:
            # zero their gradient update, write the new u back afterwards
            d_grads = {k: (jnp.zeros_like(v) if k.endswith(".u") else v)
                       for k, v in d_grads.items()}
            g_updates, gen_opt = self.gen_tx.update(g_grads, gen_opt,
                                                    gen_params)
            gen_params = optax.apply_updates(gen_params, g_updates)
            d_updates, disc_opt = self.disc_tx.update(d_grads, disc_opt,
                                                      disc_params)
            disc_params = optax.apply_updates(disc_params, d_updates)
            disc_params = dict(disc_params)
            disc_params.update(new_u)
            return gen_params, disc_params, gen_opt, disc_opt, metrics

        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import PartitionSpec as P
            step = jax.shard_map(
                step, mesh=mesh,
                in_specs=(P(), P(), P(), P(), P("data"), P("data"),
                          P("data")),
                out_specs=(P(), P(), P(), P(), P()), check_vma=False)
        return jax.jit(step, donate_argnums=(0, 1, 2, 3))

    # -- state -----------------------------------------------------------
    def init_state(self, gen_params: Dict,
                   disc_seed: int = 0) -> ECState:
        # copy (not alias): the jitted step donates its param buffers, and
        # the caller may hand the same init tree to several trainers
        gen_params = {k: jnp.array(v) for k, v in gen_params.items()}
        disc_params = random_discriminator_params(self.disc_in_ch, disc_seed)
        return ECState(gen_params, disc_params,
                       self.gen_tx.init(gen_params),
                       self.disc_tx.init(disc_params))

    def run_step(self, state: ECState, rgb, disp, mask) -> Dict:
        if self.mesh is not None:
            from mpiflow_tpu.parallel.mesh import shard_batch
            rgb, disp, mask = (shard_batch(self.mesh, b)
                               for b in (rgb, disp, mask))
        (state.gen_params, state.disc_params, state.gen_opt,
         state.disc_opt, metrics) = self.step_fn(
            state.gen_params, state.disc_params, state.gen_opt,
            state.disc_opt, rgb, disp, mask)
        state.step += 1
        return metrics


def save_ec_checkpoint(path: str, trees: Dict[str, Dict]):
    """Persist {edge, inpaint, disp} generator trees as one npz in the
    ec_params layout the stage-2 synthesizer consumes."""
    flat = {}
    for name, tree in trees.items():
        for k, v in tree.items():
            flat[f"{name}/{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_ec_checkpoint(path: str) -> Dict[str, Dict]:
    data = np.load(path)
    out: Dict[str, Dict] = {}
    for key in data.files:
        name, k = key.split("/", 1)
        out.setdefault(name, {})[k] = jnp.asarray(data[key])
    return out
