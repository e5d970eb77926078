"""Depthstillation-style independent object motion (moving_obj.py equivalent).

The reference's legacy single-image pipeline (moving_obj.py:16-168): lift the
RGBD image to 3D, re-project under identity for the background and under a
random rigid transform for the masked object, z-buffer forward-splat to the
new view through a C extension (external/forward_warping/warping.c via
ctypes), build validity/collision masks, inpaint, and read the flow off the
coordinate difference. Not on the v2 generation path (the dual MPI render
replaced it) but part of the capability surface (SURVEY.md §2.1).

Here the whole core is one jittable function: projection in fused XLA and the
z-buffer splat via the sort-based kernel (mpiflow_tpu.ops.forward_warp),
bit-compatible with the C code's mask semantics.
"""
from __future__ import annotations

import random as pyrandom
from typing import Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from mpiflow_tpu.geom.camera import intrinsics_inverse
from mpiflow_tpu.geom.homography import pixel_grid_homo
from mpiflow_tpu.ops.forward_warp import forward_warp_raster
from mpiflow_tpu.ops.morphology import dilate3x3

_HI = jax.lax.Precision.HIGHEST


class ObjectMotionSample(NamedTuple):
    warped_rgb: jnp.ndarray   # [H,W,3] raw forward-warped image
    flow: jnp.ndarray         # [H,W,2] flow p1 - p0
    mask_h: jnp.ndarray       # [H,W] validity mask H
    mask_m: jnp.ndarray       # [H,W] collision mask M (>=2 writers)
    mask_p: jnp.ndarray       # [H,W] final anti-collision mask P
    mask_h_prime: jnp.ndarray  # [H,W] H' = H * P


def sample_object_translation(rng: pyrandom.Random) -> np.ndarray:
    """The reference's random object transform (moving_obj.py:81-94):
    translation cix=U*0.05+0.05, ciy=-(U*0.05+0.05), ciz=U*0.05+0.05;
    rotation drawn but zeroed (:94). Consumes the RNG stream identically."""
    cix = rng.random() * 0.05 + 0.05
    ciy = -1 * (rng.random() * 0.05 + 0.05)
    ciz = rng.random() * 0.05 + 0.05
    for _ in range(3):  # angle draws (consumed, then overwritten with zeros)
        rng.random()
        rng.randrange(2)
    return np.array([cix, ciy, ciz], np.float32)


def _project(xyz: jnp.ndarray, K: jnp.ndarray, t: jnp.ndarray,
             width: int, height: int, eps: float = 1e-7):
    """Project 3D points under a translation-only transform, reproducing the
    reference's normalize/denormalize round trip (geometry.py:52-76 +
    moving_obj.py:114-117). xyz [3,N]. Returns (pix [2,N], z [N])."""
    cam = jnp.matmul(K, xyz + t[:, None], precision=_HI)
    z = cam[2]
    pix = cam[0:2] / (z[None] + eps)
    # normalized [-1,1] then back to [0,W-1]x[0,H-1] (matches fp rounding)
    nx = (pix[0] / (width - 1) - 0.5) * 2.0
    ny = (pix[1] / (height - 1) - 0.5) * 2.0
    px = (nx + 1.0) / 2.0 * (width - 1)
    py = (ny + 1.0) / 2.0 * (height - 1)
    return jnp.stack([px, py]), z


def object_motion_sample(rgb: jnp.ndarray, disp: jnp.ndarray,
                         K: jnp.ndarray, instance_mask: jnp.ndarray,
                         t_obj: jnp.ndarray) -> ObjectMotionSample:
    """Jittable core of moveing_object_with_mask (moving_obj.py:16-168).

    rgb [H,W,3] uint8-valued float; disp [H,W] in [0,1]; K [3,3];
    instance_mask [H,W] (nonzero = object); t_obj [3] object translation.
    """
    H, W, _ = rgb.shape
    depth = 1.0 / (disp + 0.005)
    depth = jnp.minimum(depth, 100.0)                     # :29-30

    grid = jnp.asarray(pixel_grid_homo(H, W))
    rays = jnp.matmul(intrinsics_inverse(K), grid.reshape(3, -1),
                      precision=_HI)
    xyz = rays * depth.reshape(-1)[None]                  # [3,N]

    p1, z1 = _project(xyz, K, jnp.zeros(3, rgb.dtype), W, H)
    pi, zi = _project(xyz, K, t_obj.astype(rgb.dtype), W, H)

    obj = (instance_mask.reshape(-1) > 0)
    p1 = jnp.where(obj[None], pi, p1)                     # :107-112
    z1 = jnp.where(obj, zi, z1)

    safe_x = jnp.clip(jnp.floor(p1[0]).astype(jnp.int32), 0, W - 1)  # :121-122
    safe_y = jnp.clip(jnp.floor(p1[1]).astype(jnp.int32), 0, H - 1)

    warp = forward_warp_raster(rgb, safe_x.reshape(H, W),
                               safe_y.reshape(H, W), z1.reshape(H, W))

    # mask algebra (moving_obj.py:136-150)
    mask_h = warp.valid
    m = (1 - (warp.collision == warp.valid).astype(jnp.uint8))
    m_dil = dilate3x3(m.astype(jnp.float32)).astype(jnp.uint8)
    mask_p = (m_dil == m).astype(jnp.uint8)
    mask_hp = mask_h * mask_p

    p0 = grid[0:2].reshape(2, -1)
    flow = (p1 - p0).reshape(2, H, W).transpose(1, 2, 0)  # :153
    return ObjectMotionSample(warped_rgb=warp.rgb, flow=flow, mask_h=mask_h,
                              mask_m=m, mask_p=mask_p, mask_h_prime=mask_hp)


def moving_object_with_mask(rgb_u8: np.ndarray, disp: np.ndarray,
                            K: np.ndarray, instance_mask: np.ndarray,
                            rng: pyrandom.Random,
                            inpaint: str = "jax") -> Dict[str, np.ndarray]:
    """Host wrapper: draw the random object transform, run the jitted core,
    inpaint invalid regions (reference: TELEA; here diffusion or cv2)."""
    t_obj = sample_object_translation(rng)
    out = jax.jit(object_motion_sample)(
        jnp.asarray(rgb_u8, jnp.float32), jnp.asarray(disp, jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.asarray(instance_mask),
        jnp.asarray(t_obj))
    im_raw = np.asarray(out.warped_rgb).astype(np.uint8)
    h = np.asarray(out.mask_h)
    if inpaint == "cv2":
        from mpiflow_tpu.ops.inpaint import inpaint_cv2
        im1 = inpaint_cv2(im_raw, 1 - h, radius=3, method="telea")
    else:
        from mpiflow_tpu.ops.inpaint import diffusion_inpaint
        filled = diffusion_inpaint(jnp.asarray(im_raw, jnp.float32),
                                   jnp.asarray(1 - h), num_iters=128)
        im1 = np.clip(np.round(np.asarray(filled)), 0, 255).astype(np.uint8)
    return {
        "im1": im1, "im1_raw": im_raw,
        "flow": np.asarray(out.flow),
        "H": h, "M": np.asarray(out.mask_m), "P": np.asarray(out.mask_p),
        "H'": np.asarray(out.mask_h_prime),
        "t_obj": t_obj,
    }
