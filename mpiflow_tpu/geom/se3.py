"""SE(3) pose construction from (axis-angle, translation) parameters.

Functionally equivalent to the monodepth2-derived helpers in the reference
(geometry.py:79-153), written as batched jnp functions. Shapes are leading-
batch agnostic: inputs [..., 3] produce [..., 4, 4].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation as a 4x4 homogeneous matrix [..., 4, 4].

    Same Rodrigues construction as reference geometry.py:114-153 (including
    the 1e-7 axis-normalization epsilon).
    """
    vec = jnp.asarray(vec)
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # [...,1]
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    rot = jnp.stack([
        jnp.stack([x * xC + ca, xyC - zs, zxC + ys, zero], axis=-1),
        jnp.stack([xyC + zs, y * yC + ca, yzC - xs, zero], axis=-1),
        jnp.stack([zxC - ys, yzC + xs, z * zC + ca, zero], axis=-1),
        jnp.stack([zero, zero, zero, one], axis=-1),
    ], axis=-2)
    return rot


def get_translation_matrix(translation: jnp.ndarray) -> jnp.ndarray:
    """Translation [..., 3] -> 4x4 homogeneous matrix (reference geometry.py:98-111)."""
    translation = jnp.asarray(translation)
    batch = translation.shape[:-1]
    T = jnp.broadcast_to(jnp.eye(4, dtype=translation.dtype), batch + (4, 4))
    return T.at[..., :3, 3].set(translation)


def transformation_from_parameters(axisangle: jnp.ndarray,
                                   translation: jnp.ndarray,
                                   invert: bool = False) -> jnp.ndarray:
    """(axis-angle [...,3], translation [...,3]) -> 4x4 pose [...,4,4].

    M = T @ R (or R^T @ (-T) when invert), reference geometry.py:79-95.
    """
    R = rot_from_axisangle(axisangle)
    t = jnp.asarray(translation)
    if invert:
        # R^T @ T(-t): rotation transposed, translation R^T @ (-t).
        # Composed analytically (a 4x4 matmul would hit the MXU at default
        # bf16 precision on TPU and corrupt the pose).
        Rt = jnp.swapaxes(R, -1, -2)
        t_new = -jnp.einsum("...ij,...j->...i", Rt[..., :3, :3],
                            t.astype(R.dtype),
                            precision=jax.lax.Precision.HIGHEST)
        return Rt.at[..., :3, 3].set(t_new)
    # T(t) @ R: rotation unchanged, translation column set to t.
    return R.at[..., :3, 3].set(t.astype(R.dtype))
