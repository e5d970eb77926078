"""EdgeConnect inpainting networks (warpback stage-1 inpainters) in JAX.

Functional inference equivalents of the reference's EdgeConnect trio
(warpback/networks.py): InpaintGenerator (RGB, 4->3), EdgeGenerator
(spectral-normalized, 3->1, sigmoid) and the disparity InpaintGenerator
(2->1), loaded from the published weights via
mpiflow_tpu.models.torch_convert (which materializes spectral-norm weights).

Used by the warpback stage-2 dataset (stage2_dataset.py:113-133) to fill
warp holes before training the MPI predictor.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mpiflow_tpu.models.nn import (
    P, conv2d, conv_transpose2d, instance_norm, reflection_pad, relu,
)


def _resnet_block(x, p: P, dilation: int = 2):
    """ResnetBlock (networks.py:163-179): two reflection-padded convs with
    instance norm; first dilated."""
    y = reflection_pad(x, dilation)
    y = conv2d(y, p["conv_block.1.weight"], p.get("conv_block.1.bias"),
               dilation=dilation)
    y = relu(instance_norm(y))
    y = reflection_pad(y, 1)
    y = conv2d(y, p["conv_block.5.weight"], p.get("conv_block.5.bias"))
    y = instance_norm(y)
    return x + y


def _generator(params: Dict, x: jnp.ndarray, prefix: str,
               residual_blocks: int = 8) -> jnp.ndarray:
    """Shared encoder/middle/decoder trunk (networks.py:62-160). NHWC."""
    p = P(params, prefix)
    y = reflection_pad(x, 3)
    y = relu(instance_norm(conv2d(y, p["encoder.1.weight"],
                                  p.get("encoder.1.bias"))))
    y = relu(instance_norm(conv2d(y, p["encoder.4.weight"],
                                  p.get("encoder.4.bias"),
                                  stride=2, padding=1)))
    y = relu(instance_norm(conv2d(y, p["encoder.7.weight"],
                                  p.get("encoder.7.bias"),
                                  stride=2, padding=1)))
    for i in range(residual_blocks):
        y = _resnet_block(y, p.sub(f"middle.{i}."))
    y = relu(instance_norm(conv_transpose2d(
        y, p["decoder.0.weight"], p.get("decoder.0.bias"), 2, 1)))
    y = relu(instance_norm(conv_transpose2d(
        y, p["decoder.3.weight"], p.get("decoder.3.bias"), 2, 1)))
    y = reflection_pad(y, 3)
    return conv2d(y, p["decoder.7.weight"], p.get("decoder.7.bias"))


def inpaint_generator(params: Dict, x: jnp.ndarray,
                      prefix: str = "") -> jnp.ndarray:
    """InpaintGenerator.forward (networks.py:104-110): (tanh+1)/2 output."""
    return (jnp.tanh(_generator(params, x, prefix)) + 1.0) / 2.0


def edge_generator(params: Dict, x: jnp.ndarray,
                   prefix: str = "") -> jnp.ndarray:
    """EdgeGenerator.forward (networks.py:155-160): sigmoid output."""
    return jax.nn.sigmoid(_generator(params, x, prefix))


def spectral_normalize(w: jnp.ndarray, u: jnp.ndarray, eps: float = 1e-12):
    """One-power-iteration spectral normalization.

    torch.nn.utils.spectral_norm semantics: `u` persists across steps, `v`
    is recomputed, gradients flow through w/sigma with u and v stopped.
    w is HWIO (flattened to (K, O) rows -- row permutation doesn't change
    the spectral norm); u has shape (O,). Returns (w/sigma, new_u).
    """
    out_ch = w.shape[-1]
    w_mat = w.reshape(-1, out_ch).T                       # (O, K)
    v = w_mat.T @ u
    v = jax.lax.stop_gradient(v / (jnp.linalg.norm(v) + eps))
    u_new = w_mat @ v
    u_new = jax.lax.stop_gradient(u_new / (jnp.linalg.norm(u_new) + eps))
    sigma = u_new @ (w_mat @ v)
    return w / sigma, u_new


_DISC_CH = (64, 128, 256, 512, 1)
_DISC_STRIDES = (2, 2, 2, 1, 1)


def random_discriminator_params(in_channels: int, seed: int = 0) -> Dict:
    """70x70 PatchGAN discriminator parameters (the EdgeConnect paper's
    discriminator; the reference snapshot ships only generators,
    warpback/networks.py, because it consumes pretrained weights).
    Spectral-normalized convs carry a persistent power-iteration vector
    `conv{i}.u` (non-trainable, updated like a BN buffer)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    params = {}
    cin = in_channels
    for i, cout in enumerate(_DISC_CH):
        fan = 4 * 4 * cin
        params[f"conv{i}.weight"] = jnp.asarray(
            rng.randn(4, 4, cin, cout).astype("float32")
            * (2.0 / fan) ** 0.5)
        params[f"conv{i}.u"] = jnp.asarray(
            rng.randn(cout).astype("float32"))
        cin = cout
    return params


def discriminator(params: Dict, x: jnp.ndarray):
    """PatchGAN forward. x NHWC. Returns (logits [N,h,w,1],
    features [conv1..conv5 activations], new_u dict to write back)."""
    feats = []
    new_u = {}
    y = x
    for i, stride in enumerate(_DISC_STRIDES):
        w, u = params[f"conv{i}.weight"], params[f"conv{i}.u"]
        w_sn, u_new = spectral_normalize(w, u)
        new_u[f"conv{i}.u"] = u_new
        y = conv2d(y, w_sn, stride=stride, padding=1)
        if i < len(_DISC_STRIDES) - 1:
            y = jax.nn.leaky_relu(y, 0.2)
        feats.append(y)
    return y, feats, new_u


def load_edge_connect(weight_dir: str):
    """Load the three checkpoints (networks.py:11-26). Returns a dict of
    parameter trees {edge, inpaint, disp} for the functions above."""
    import os
    from mpiflow_tpu.models.torch_convert import (load_torch_checkpoint,
                                                  convert_state_dict)
    out = {}
    for name, fn in (("inpaint", "InpaintingModel_gen.pth"),
                     ("edge", "EdgeModel_gen.pth"),
                     ("disp", "InpaintingModel_disp.pth")):
        ckpt = load_torch_checkpoint(os.path.join(weight_dir, fn))
        sd = ckpt.get("generator", ckpt)
        out[name] = {k: jnp.asarray(v)
                     for k, v in convert_state_dict(sd).items()}
    return out
