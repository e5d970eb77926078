"""Functional NN primitives with exact torch semantics, NHWC layout.

The model zoo (AdaMPI/CPN, PAN, EdgeConnect, RAFT) is implemented as pure
functions over flat parameter dicts keyed by the *torch state-dict names* of
the reference checkpoints, so published weights convert 1:1
(mpiflow_tpu.models.torch_convert). Activations are NHWC (TPU-native conv
layout); conv weights are stored HWIO.

Inference-mode norms follow torch defaults:
  * BatchNorm2d eval: running stats (affine)
  * InstanceNorm2d: per-instance stats, affine=False, no running stats
  * GroupNorm: affine
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[int, Tuple[int, int]] = 0,
           dilation: Union[int, Tuple[int, int]] = 1) -> jnp.ndarray:
    """torch.nn.Conv2d equivalent. x: [N,H,W,C]; w: [kh,kw,Cin,Cout]."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    return out


def conv_transpose2d(x: jnp.ndarray, w: jnp.ndarray,
                     b: Optional[jnp.ndarray] = None,
                     stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """torch.nn.ConvTranspose2d equivalent (the EdgeConnect k4 s2 p1 case).

    w: [kh,kw,Cout,Cin] (torch IOHW converted to HWOI by the converter).
    Implemented as input dilation + flipped-kernel convolution, which is
    exactly torch's transposed conv arithmetic.
    """
    kh, kw = w.shape[0], w.shape[1]
    out = jax.lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)).swapaxes(2, 3),
        window_strides=(1, 1),
        padding=((kh - 1 - padding, kh - 1 - padding),
                 (kw - 1 - padding, kw - 1 - padding)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    return out


def batch_norm(x: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray,
               gamma: Optional[jnp.ndarray], beta: Optional[jnp.ndarray],
               eps: float = 1e-5) -> jnp.ndarray:
    """BatchNorm2d in eval mode (running stats). Channel-last."""
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * inv
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out


def batch_norm_train(x: jnp.ndarray, gamma: Optional[jnp.ndarray],
                     beta: Optional[jnp.ndarray], eps: float = 1e-5):
    """BatchNorm2d with batch statistics (training forward). Returns
    (out, batch_mean, batch_var) -- running-stat updates are the caller's."""
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out, mean, var


def instance_norm(x: jnp.ndarray, gamma=None, beta=None,
                  eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d (per-sample, per-channel spatial stats; torch default
    affine=False)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out


def group_norm(x: jnp.ndarray, num_groups: int, gamma, beta,
               eps: float = 1e-5) -> jnp.ndarray:
    N, H, W, C = x.shape
    xg = x.reshape(N, H, W, num_groups, C // num_groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(N, H, W, C)
    return out * gamma + beta


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, slope: float = 0.1):
    return jnp.where(x >= 0, x, slope * x)


def elu(x):
    # double-where guard: without it, expm1(x) overflows to inf in the
    # UNTAKEN branch for large positive x and the where-VJP computes
    # 0 * inf = NaN -- forward-only use never sees this, but the AdaMPI
    # trainer differentiates through every decoder ELU
    safe = jnp.where(x >= 0, 0.0, x)
    return jnp.where(x >= 0, x, jnp.expm1(safe))


def max_pool(x: jnp.ndarray, k: int = 3, stride: int = 2,
             padding: int = 1) -> jnp.ndarray:
    """torch MaxPool2d(k, stride, padding) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """UpsamplingNearest2d(scale_factor=2) on NHWC."""
    N, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (N, H, scale, W, scale, C))
    return x.reshape(N, H * scale, W * scale, C)


def upsample_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                    out_w: int) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=True) on NHWC."""
    from mpiflow_tpu.ops.resample import resize_bilinear_align_corners
    def one(img_hwc):
        return resize_bilinear_align_corners(
            img_hwc.transpose(2, 0, 1), out_h, out_w).transpose(1, 2, 0)
    return jax.vmap(one)(x)


def reflection_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """ReflectionPad2d on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """F.adaptive_avg_pool2d on NHWC."""
    from mpiflow_tpu.ops.resample import adaptive_avg_pool2d
    return adaptive_avg_pool2d(x.transpose(0, 3, 1, 2), out_h, out_w
                               ).transpose(0, 2, 3, 1)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None):
    """torch Linear; w stored [out,in] as in the state dict."""
    out = x @ w.T
    if b is not None:
        out = out + b
    return out


# ------------------------------------------------------------- param utils
class P:
    """Flat parameter-dict view with a prefix, mirroring torch submodules.

    p = P(params, "encoder.")  ->  p["conv1.weight"] reads
    params["encoder.conv1.weight"]; p.sub("layer1.") nests.
    """

    def __init__(self, params: dict, prefix: str = ""):
        self._p = params
        self._prefix = prefix

    def __getitem__(self, key: str):
        return self._p[self._prefix + key]

    def get(self, key: str, default=None):
        return self._p.get(self._prefix + key, default)

    def __contains__(self, key: str) -> bool:
        return (self._prefix + key) in self._p

    def sub(self, prefix: str) -> "P":
        return P(self._p, self._prefix + prefix)

    def key(self, name: str) -> str:
        """Full flat-dict key for `name` under this view's prefix."""
        return self._prefix + name


def conv_bn_act(x, p: P, conv_name: str, bn_name: str, act,
                stride=1, padding=0, dilation=1):
    """conv (+bias if present) -> eval BatchNorm -> activation."""
    x = conv2d(x, p[f"{conv_name}.weight"], p.get(f"{conv_name}.bias"),
               stride=stride, padding=padding, dilation=dilation)
    x = batch_norm(x, p[f"{bn_name}.running_mean"], p[f"{bn_name}.running_var"],
                   p.get(f"{bn_name}.weight"), p.get(f"{bn_name}.bias"))
    return act(x) if act is not None else x
