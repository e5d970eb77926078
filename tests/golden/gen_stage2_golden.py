#!/usr/bin/env python
"""Chained stage-2 golden: mesh-render -> canny -> EdgeConnect inpaint pair.

Executes the REFERENCE's stage-2 inpainting chain (stage2_dataset.py
inpaint(), :113-133) in torch -- grayscale, edge inpaint, RGB inpaint,
disparity inpaint, hole-merge formulas, exact concat orders and the
`image + mask_hole` offsets -- on a warp output produced by this repo's
RGBD renderer, with randomized EdgeConnect weights (the published
ecweight/*.pth are stripped from the snapshot).

Two substitutions, both forced by this environment and recorded here:
  * the mesh warp comes from mpiflow_tpu.warpback.renderer (the reference's
    pytorch3d CUDA rasterizer is not installable here); the warp output is
    saved as INPUT, so the fixture gates the inpaint chain, not the warp
    (the warp itself is property-tested in tests/test_warpback.py);
  * the edge map comes from mpiflow_tpu.ops.canny (the reference calls
    skimage.feature.canny, and skimage is absent); the edge is saved as
    INPUT to the torch chain, so both sides consume the identical map.

Usage: python tests/golden/gen_stage2_golden.py   (requires torch + /root/reference)
"""
import os
import pathlib
import sys

import numpy as np

REFERENCE = os.environ.get("MPIFLOW_REFERENCE", "/root/reference")
OUT = pathlib.Path(__file__).resolve().parent / "data"
REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, REFERENCE)
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import torch  # noqa: E402
from warpback.networks import InpaintGenerator, EdgeGenerator  # noqa: E402


def randomize(model, seed):
    rng = np.random.RandomState(seed)
    new = {}
    for k, v in model.state_dict().items():
        if v.ndim == 0 or k.endswith("weight_u") or k.endswith("weight_v"):
            new[k] = v
        else:
            new[k] = torch.from_numpy(
                (rng.randn(*v.shape) * 0.05).astype(np.float32))
    model.load_state_dict(new)


def manifest(model):
    ks, shapes = [], []
    for k, v in model.state_dict().items():
        ks.append(k)
        shapes.append(",".join(map(str, v.shape)))
    return np.array(ks), np.array(shapes)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mpiflow_tpu.warpback.renderer import rgbd_render
    from mpiflow_tpu.warpback.datasets import K_NORM
    from mpiflow_tpu.ops.canny import canny_edges
    from mpiflow_tpu.geom.se3 import transformation_from_parameters

    H, W = 64, 96
    rng = np.random.RandomState(5)
    rgb = rng.rand(3, H, W).astype(np.float32)
    disp = np.full((H, W), 0.3, np.float32)
    disp[20:44, 28:64] = 0.75
    ext = np.asarray(transformation_from_parameters(
        jnp.asarray([0.0, 0.02, 0.0]), jnp.asarray([0.12, 0.0, 0.0])))

    warp_rgb, warp_disp, warp_mask = rgbd_render(
        jnp.asarray(rgb), jnp.asarray(disp), jnp.asarray(K_NORM),
        jnp.asarray(ext))
    warp_rgb = np.asarray(warp_rgb)
    warp_disp = np.asarray(warp_disp)
    warp_mask = (np.asarray(warp_mask) > 0.5).astype(np.float32)

    gray = (0.2989 * warp_rgb[0] + 0.587 * warp_rgb[1]
            + 0.114 * warp_rgb[2]).astype(np.float32)
    edge = np.asarray(canny_edges(jnp.asarray(gray), sigma=2.0,
                                  mask=jnp.asarray(warp_mask)))

    # ---- the reference inpaint() chain, torch, eval mode ----------------
    torch.manual_seed(0)
    edge_model = EdgeGenerator()
    inpaint_model = InpaintGenerator()
    disp_model = InpaintGenerator(in_channels=2, out_channels=1)
    randomize(edge_model, 21)
    randomize(inpaint_model, 22)
    randomize(disp_model, 23)
    for m in (edge_model, inpaint_model, disp_model):
        m.eval()

    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))[None]
    image = t(warp_rgb)                               # [1,3,H,W]
    dsp = t(warp_disp[None])                          # [1,1,H,W]
    mask = t(warp_mask[None])
    gray_t = t(gray[None])
    edge_t = t(edge[None])
    mask_hole = 1 - mask
    with torch.no_grad():
        edge_inpaint = edge_model(
            torch.cat([gray_t, edge_t, mask_hole], dim=1))
        image_inpaint = inpaint_model(
            torch.cat([image + mask_hole, edge_inpaint], dim=1))
        image_merged = image * (1 - mask_hole) + image_inpaint * mask_hole
        disp_inpaint = disp_model(
            torch.cat([dsp + mask_hole, edge_inpaint], dim=1))
        disp_merged = dsp * (1 - mask_hole) + disp_inpaint * mask_hole

    ek, esh = manifest(edge_model)
    ik, ish = manifest(inpaint_model)
    dk, dsh = manifest(disp_model)
    uv = {f"uv.{k}": v.numpy() for k, v in edge_model.state_dict().items()
          if k.endswith("weight_u") or k.endswith("weight_v")}
    np.savez(
        OUT / "stage2_chain.npz",
        rgb=rgb, disp=disp, ext=ext,
        warp_rgb=warp_rgb, warp_disp=warp_disp, warp_mask=warp_mask,
        gray=gray, edge=edge,
        edge_inpaint=edge_inpaint.numpy(),
        image_merged=image_merged.numpy(),
        disp_merged=disp_merged.numpy(),
        edge_keys=ek, edge_shapes=esh, edge_seed=21,
        inp_keys=ik, inp_shapes=ish, inp_seed=22,
        disp_keys=dk, disp_shapes=dsh, disp_seed=23,
        **uv)
    print("wrote", OUT / "stage2_chain.npz")


if __name__ == "__main__":
    main()
