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
