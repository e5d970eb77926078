"""Independent-object-motion rendering: dual-pose MPI render + compositing.

Equivalent of the reference's render_3dphoto_dynamic (utils/utils.py:159-288):
render the MPI twice -- once under the *object* pose tracking the object
mask, once under the *camera* pose tracking the background mask -- then
composite images and flows by the masks and fill motion-occlusion holes.

The reference does the mask compositing in numpy on the host after six
full-resolution device->host transfers (utils/utils.py:237-286); here the
entire composition (including the uint8 quantization it performs first) runs
inside jit, and only the final sample leaves the device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mpiflow_tpu.render.mpi import render_novel_view
from mpiflow_tpu.ops.inpaint import diffusion_inpaint


class DynamicSample(NamedTuple):
    flow: jnp.ndarray       # [H,W,2] mixed ground-truth flow
    src_u8: jnp.ndarray     # [H,W,3] uint8 source image
    dst_u8: jnp.ndarray     # [H,W,3] uint8 inpainted target image
    frame_mix_u8: jnp.ndarray  # [H,W,3] uint8 target BEFORE inpainting
    holes: jnp.ndarray      # [H,W] int32 inpainting mask (1 = hole)


def _to_u8f(img_3hw: jnp.ndarray) -> jnp.ndarray:
    """round(x*255) clipped, as float (reference utils/utils.py:175,240)."""
    return jnp.clip(jnp.round(img_3hw * 255.0), 0.0, 255.0)


def compose_dynamic_pair(frame_obj, mask_obj, flow_obj,
                         frame_cam, mask_cam, flow_cam,
                         obj_mask_src, mask_thresh: float = 0.99):
    """Mask compositing of the two renders (utils/utils.py:269-283).

    Args:
      frame_obj/frame_cam: [3,H,W] composited rgb of the object-pose /
        camera-pose renders.
      mask_obj/mask_cam: [H,W] composited warped object / background masks.
      flow_obj/flow_cam: [2,H,W] flows of the two renders.
      obj_mask_src: [H,W] the object mask in the SOURCE frame.

    Returns (flow_mix [H,W,2], frame_mix_u8f [3,H,W] float u8-quantized,
             holes [H,W] int32).
    """
    t = mask_thresh
    # flows composited by the SOURCE-frame object mask (utils/utils.py:270-278)
    obj_src = obj_mask_src >= t
    flow_mix = jnp.where(obj_src[None], flow_obj, flow_cam)

    # frames: white-out unobserved regions, then paste object over background
    # by the WARPED object mask (utils/utils.py:273-276)
    f_obj = jnp.where((mask_obj < t)[None], 255.0, _to_u8f(frame_obj))
    f_cam = jnp.where((mask_cam < t)[None], 255.0, _to_u8f(frame_cam))
    obj_tgt = mask_obj >= t
    frame_mix = jnp.where(obj_tgt[None], f_obj, f_cam)

    # hole mask: background visibility with the object region forced valid
    # (utils/utils.py:280-283)
    fill = jnp.where(obj_tgt, 1.0, mask_cam)
    holes = (fill < t).astype(jnp.int32)
    return flow_mix.transpose(1, 2, 0), frame_mix, holes


def render_dynamic_sample(mpi_rgb: jnp.ndarray,
                          mpi_sigma: jnp.ndarray,
                          disparities: jnp.ndarray,
                          src_img: jnp.ndarray,
                          obj_mask: jnp.ndarray,
                          G_obj: jnp.ndarray,
                          G_cam: jnp.ndarray,
                          K_src: jnp.ndarray,
                          K_tgt: jnp.ndarray,
                          mask_thresh: float = 0.99,
                          flow_clip: float = 200.0,
                          hard_flow: bool = False,
                          inpaint_iters: int = 128,
                          inpaint_on_device: bool = True,
                          mode: str = "scan",
                          warp_dtype=None) -> DynamicSample:
    """Full dynamic-object sample generation (render_3dphoto_dynamic).

    Args:
      mpi_rgb:   [S,3,H,W] raw MPI colors (source blending fused inside).
      mpi_sigma: [S,1,H,W].
      disparities: [S].
      src_img:   [3,H,W] in [0,1].
      obj_mask:  [H,W] in [0,1] (bilinear-resized instance mask).
      G_obj:     [4,4] object-motion pose (tracks the object mask).
      G_cam:     [4,4] camera-motion pose (tracks the background mask).

    Returns DynamicSample with the mixed flow (as [H,W,2]), uint8 src/dst.
    """
    if mode in ("preblocked", "quad", "pallas"):
        # the heavy pose-independent precompute (blend + blocked layout +
        # source weights) is shared by both pose renders; the obj and
        # background masks differ only in the tracked mask channel.
        # "quad" gathers one row per 2x2 output tile; "pallas" runs the
        # VMEM-tiled warp kernel (2x the XLA gather on v5e) -- both exact,
        # with guarded per-pixel fallbacks (see render/mpi.py,
        # ops/pallas_warp.py)
        from mpiflow_tpu.render.mpi import (preblock_mpi,
                                            render_novel_view_preblocked)
        pre = preblock_mpi(mpi_rgb, mpi_sigma, disparities, K_src,
                           src_img=src_img, obj_mask=obj_mask,
                           halo=5 if mode == "quad" else 3,
                           pallas=mode == "pallas",
                           warp_dtype=warp_dtype)
        r_obj = render_novel_view_preblocked(pre, disparities, G_obj,
                                             K_src, K_tgt,
                                             flow_clip=flow_clip,
                                             hard_flow=hard_flow)
        # the camera render tracks (1 - obj); since bilinear warping is
        # affine, warp(1-obj) = 1-warp(obj) and its composite is exactly
        # w_sum - obj_acc -- handled by invert_mask, no second preblock
        r_cam = render_novel_view_preblocked(pre, disparities, G_cam,
                                             K_src, K_tgt,
                                             flow_clip=flow_clip,
                                             hard_flow=hard_flow,
                                             invert_mask=True)
    else:
        r_obj = render_novel_view(mpi_rgb, mpi_sigma, disparities, G_obj,
                                  K_src, K_tgt, src_img=src_img,
                                  obj_mask=obj_mask, flow_clip=flow_clip,
                                  hard_flow=hard_flow, mode=mode)
        r_cam = render_novel_view(mpi_rgb, mpi_sigma, disparities, G_cam,
                                  K_src, K_tgt, src_img=src_img,
                                  obj_mask=1.0 - obj_mask,
                                  flow_clip=flow_clip,
                                  hard_flow=hard_flow, mode=mode)

    flow_mix, frame_mix, holes = compose_dynamic_pair(
        r_obj.frame, r_obj.obj_mask, r_obj.flow,
        r_cam.frame, r_cam.obj_mask, r_cam.flow,
        obj_mask, mask_thresh)

    frame_mix_u8 = frame_mix.astype(jnp.uint8).transpose(1, 2, 0)
    if inpaint_on_device:
        filled = diffusion_inpaint(frame_mix.transpose(1, 2, 0), holes,
                                   num_iters=inpaint_iters)
        dst_u8 = jnp.clip(jnp.round(filled), 0, 255).astype(jnp.uint8)
    else:
        dst_u8 = frame_mix_u8  # caller inpaints on host (cv2 parity mode)

    src_u8 = _to_u8f(src_img).astype(jnp.uint8).transpose(1, 2, 0)
    return DynamicSample(flow=flow_mix, src_u8=src_u8, dst_u8=dst_u8,
                         frame_mix_u8=frame_mix_u8, holes=holes)
