#!/usr/bin/env python
"""Generate golden parity fixtures by RUNNING the torch reference on CPU.

The reference (mounted read-only at /root/reference) is the numerical oracle
for the TPU rebuild (SURVEY.md §4: "the reference itself is the oracle").
This script imports the reference modules, patches out their CUDA-only
plumbing (`.cuda()` no-ops, fp64-CPU matrix inverse, torchvision stubs), runs
the geometry / rendering / end-to-end paths in fp32 at small shapes, and
dumps inputs+outputs to tests/golden/data/*.npz.

Run once; the .npz files are committed so the test suite never needs torch
or the reference mount. No reference code is copied -- it is only executed.

Usage: python tests/golden/gen_goldens.py
"""
import os
import sys
import types
import pathlib

import numpy as np

REFERENCE = os.environ.get("MPIFLOW_REFERENCE", "/root/reference")
OUT = pathlib.Path(__file__).resolve().parent / "data"
OUT.mkdir(parents=True, exist_ok=True)

# ---------------------------------------------------------------- patching
import torch

torch.Tensor.cuda = lambda self, *a, **k: self  # run the GPU code paths on CPU
if not torch.cuda.is_available():
    torch.cuda.synchronize = lambda *a, **k: None

# torchvision is absent in this image; utils/utils.py only uses
# transforms.ToTensor and save_image, neither on the paths we exercise.
tv = types.ModuleType("torchvision")
tv_transforms = types.ModuleType("torchvision.transforms")
tv_transforms.ToTensor = object
tv_utils = types.ModuleType("torchvision.utils")
tv_utils.save_image = lambda *a, **k: None
tv.transforms = tv_transforms
tv.utils = tv_utils
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.transforms", tv_transforms)
sys.modules.setdefault("torchvision.utils", tv_utils)

sys.path.insert(0, REFERENCE)
os.chdir(REFERENCE)  # moving_obj.py loads libwarping.so by relative path

from utils.mpi import mpi_rendering  # noqa: E402
from utils.mpi import homography_sampler as hs  # noqa: E402
import geometry  # noqa: E402

hs.inverse = lambda m: torch.inverse(m)  # CPU-safe fp64 inverse

import utils.utils as ref_utils  # noqa: E402  (imports moving_obj -> libwarping.so)

# ---------------------------------------------------------------- helpers
S, H, W = 8, 32, 48
SEED = 1234


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def make_K(width, height):
    K = np.array([[0.58, 0, 0.5], [0, 0.58, 0.5], [0, 0, 1]], np.float32)
    K[0, :] *= width
    K[1, :] *= height
    return K


def make_scene(rng):
    disp = np.linspace(1.0, 0.001, S + 2, dtype=np.float64)[1:-1].astype(np.float32)
    rgb = rng.rand(1, S, 3, H, W).astype(np.float32)
    sigma = (np.abs(rng.randn(1, S, 1, H, W)) * 3.0 + 1e-4).astype(np.float32)
    ang = (rng.rand(3).astype(np.float32) - 0.5) * 0.12
    trans = (rng.rand(3).astype(np.float32) - 0.5) * 0.3
    G = geometry.transformation_from_parameters(
        t(ang[None, None]), t(trans[None, None].astype(np.float64)).float())[0]
    K = make_K(W, H)
    return disp, rgb, sigma, ang, trans, G, K


# ---------------------------------------------------------------- 1. SE(3)
def gen_se3():
    rng = np.random.RandomState(SEED)
    aa = (rng.rand(16, 3).astype(np.float32) - 0.5) * 0.4
    tr = (rng.rand(16, 3).astype(np.float32) - 0.5) * 0.6
    M = geometry.transformation_from_parameters(t(aa[:, None]), t(tr[:, None]))
    Mi = geometry.transformation_from_parameters(t(aa[:, None]), t(tr[:, None]),
                                                 invert=True)
    np.savez(OUT / "se3.npz", axisangle=aa, translation=tr,
             M=M.numpy(), M_inv=Mi.numpy())


# ------------------------------------------------- 2. homography sampling
def gen_homography():
    rng = np.random.RandomState(SEED + 1)
    disp, rgb, sigma, ang, trans, G, K = make_scene(rng)
    depths = (1.0 / disp).astype(np.float32)

    sampler = hs.HomographySample(H, W, torch.device("cpu"))
    K_inv = torch.inverse(t(K).to(torch.float64)).float()

    src = rng.rand(S, 5, H, W).astype(np.float32)  # arbitrary 5-channel stack
    G_rep = G[None].repeat(S, 1, 1)
    Ki_rep = K_inv[None].repeat(S, 1, 1)
    K_rep = t(K)[None].repeat(S, 1, 1)

    tgt, valid, flow_b2a = sampler.sample(t(src), t(depths), G_rep, Ki_rep, K_rep)
    flow_a2b = sampler.sample_inverse(t(src), t(depths), G_rep, Ki_rep, K_rep)

    # also dump the homographies themselves
    R = G[:3, :3]
    tt = G[:3, 3]
    n = torch.tensor([0.0, 0.0, 1.0])
    Hs = []
    for d in depths:
        R_tnd = R - torch.outer(tt, n) / -float(d)
        Hs.append((t(K) @ R_tnd @ K_inv).numpy())
    H_tgt_src = np.stack(Hs)
    H_src_tgt = np.linalg.inv(H_tgt_src.astype(np.float64)).astype(np.float32)

    np.savez(OUT / "homography.npz",
             K=K, G=G.numpy(), depths=depths, src=src,
             tgt=tgt.numpy(), valid=valid.numpy(), flow_b2a=flow_b2a.numpy(),
             flow_a2b=flow_a2b.numpy(),
             H_tgt_src=H_tgt_src, H_src_tgt=H_src_tgt)


# ------------------------------------------------- 3. volume compositing
def gen_volume_render():
    rng = np.random.RandomState(SEED + 2)
    disp, rgb, sigma, ang, trans, G, K = make_scene(rng)
    K_inv = torch.inverse(t(K).to(torch.float64)).float()
    sampler = hs.HomographySample(H, W, torch.device("cpu"))

    xyz_src = mpi_rendering.get_src_xyz_from_plane_disparity(
        sampler.meshgrid, t(disp[None]), K_inv[None])
    xyz_tgt = mpi_rendering.get_tgt_xyz_from_plane_disparity(xyz_src, G[None])

    # source-view render (blend weights path, utils/utils.py:195-204)
    rgb_out, depth_out, blend_w, weights, _, _ = mpi_rendering.render(
        t(rgb), t(sigma), xyz_src, use_alpha=False, is_bg_depth_inf=False)

    # the pipeline tiles a single [H,W] mask over planes (utils/utils.py:328)
    obj_mask_hw = (rng.rand(1, 1, 1, H, W) > 0.5).astype(np.float32)
    obj_mask = np.tile(obj_mask_hw, (1, S, 1, 1, 1))
    tgt_rgb, tgt_depth, tgt_mask, flowA2B, tgt_obj = \
        mpi_rendering.render_tgt_rgb_depth(
            sampler, t(rgb), t(sigma), t(disp[None]), xyz_tgt, xyz_src,
            G[None], K_inv[None], t(K)[None],
            mpi_flow_src=None, use_alpha=False, is_bg_depth_inf=False,
            hard_flow=False, obj_mask=t(obj_mask))

    np.savez(OUT / "volume_render.npz",
             K=K, G=G.numpy(), disp=disp, rgb=rgb, sigma=sigma,
             obj_mask=obj_mask,
             xyz_src=xyz_src.numpy(), xyz_tgt=xyz_tgt.numpy(),
             src_rgb_out=rgb_out.numpy(), src_depth_out=depth_out.numpy(),
             src_blend_weights=blend_w.numpy(), src_weights=weights.numpy(),
             tgt_rgb=tgt_rgb.numpy(), tgt_depth=tgt_depth.numpy(),
             tgt_mask=tgt_mask.numpy(), flow_a2b=flowA2B.numpy(),
             tgt_obj_mask=tgt_obj.numpy())


# ------------------------------------------------- 4. end-to-end dynamic
def gen_e2e():
    rng = np.random.RandomState(SEED + 3)
    disp, rgb, sigma, _, _, _, K = make_scene(rng)
    src_img = rng.rand(1, 3, H, W).astype(np.float32)
    disp_map = rng.rand(1, 1, H, W).astype(np.float32)
    obj_mask = np.zeros((1, 1, H, W), np.float32)
    obj_mask[:, :, 10:22, 12:30] = 1.0
    mpi_all = np.concatenate([rgb, sigma], axis=2)  # [1,S,4,H,W]

    # fixed poses (injected into the reference via patched sampler)
    ang_cam = np.array([0.012, -0.008, 0.004], np.float32)
    t_cam = np.array([0.11, -0.09, -0.16], np.float32)
    ang_obj = np.array([-0.006, 0.01, -0.003], np.float32)
    t_obj = np.array([0.04, 0.035, -0.05], np.float32)
    G_cam = geometry.transformation_from_parameters(
        t(ang_cam[None, None]), t(t_cam[None, None]))[0]
    G_obj = geometry.transformation_from_parameters(
        t(ang_obj[None, None]), t(t_obj[None, None]))[0]

    poses = [G_cam, G_obj]  # drawn in this order (utils/utils.py:207-208)
    orig = ref_utils.generate_random_pose
    ref_utils.generate_random_pose = lambda *a, **k: poses.pop(0)
    try:
        class Opt:
            ext_cz = 0.15
        flow_mix, src_np, inpainted, _ = ref_utils.render_3dphoto_dynamic(
            Opt(), t(src_img), t(obj_mask), t(disp_map), t(mpi_all),
            t(disp[None]), t(K)[None], t(K)[None], data_path=None, name="demo")
    finally:
        ref_utils.generate_random_pose = orig

    # intermediates via direct calls for finer-grained tests
    sampler = hs.HomographySample(H, W, torch.device("cpu"))
    K_inv = torch.inverse(t(K).to(torch.float64)).float()
    xyz_src = mpi_rendering.get_src_xyz_from_plane_disparity(
        sampler.meshgrid, t(disp[None]), K_inv[None])
    _, _, blend_w, _, _, _ = mpi_rendering.render(
        t(rgb), t(sigma), xyz_src, use_alpha=False, is_bg_depth_inf=False)
    rgb_blended = blend_w * t(src_img).unsqueeze(1) + (1 - blend_w) * t(rgb)

    frame, depth_r, flowA2B, mask = ref_utils.render_novel_view_dynamic(
        t(obj_mask), rgb_blended, t(sigma), t(disp[None]), G_obj,
        K_inv[None], t(K)[None], t(K)[None], None, sampler, False)
    frame_d, depth_d, flowA2B_d, mask_d = ref_utils.render_novel_view_dynamic(
        1 - t(obj_mask), rgb_blended, t(sigma), t(disp[None]), G_cam,
        K_inv[None], t(K)[None], t(K)[None], None, sampler, False)

    np.savez(OUT / "e2e_dynamic.npz",
             K=K, disp=disp, mpi_all=mpi_all, src_img=src_img,
             disp_map=disp_map, obj_mask=obj_mask,
             ang_cam=ang_cam, t_cam=t_cam, ang_obj=ang_obj, t_obj=t_obj,
             G_cam=G_cam.numpy(), G_obj=G_obj.numpy(),
             rgb_blended=rgb_blended.numpy(),
             frame=frame.numpy(), flow=flowA2B.numpy(), mask=mask.numpy(),
             frame_dync=frame_d.numpy(), flow_dync=flowA2B_d.numpy(),
             mask_dync=mask_d.numpy(),
             flow_mix=flow_mix, src_np=src_np, inpainted=inpainted)


# ------------------------------------------------- 5. pose RNG stream
def gen_pose_stream():
    import random as pyrandom
    streams = {}
    for flavor, mod in (("kitti_v2", ref_utils),):
        pyrandom.seed(114514)
        mats, mats_obj = [], []
        for _ in range(12):
            mats.append(mod.generate_random_pose(0.15).numpy())
            mats_obj.append(mod.generate_random_pose(0.15, base_motions=[0, 0, 0]).numpy())
        streams[f"{flavor}_cam"] = np.stack(mats)
        streams[f"{flavor}_obj"] = np.stack(mats_obj)
    # coco / legacy flavors live in sibling modules with no extra imports
    import importlib
    for flavor, modname in (("coco", "utils.utils_coco"),):
        mod = importlib.import_module(modname)
        pyrandom.seed(114514)
        mats, mats_obj = [], []
        for _ in range(12):
            mats.append(mod.generate_random_pose().numpy())
            mats_obj.append(mod.generate_random_pose(base_motions=[0, 0, 0]).numpy())
        streams[f"{flavor}_cam"] = np.stack(mats)
        streams[f"{flavor}_obj"] = np.stack(mats_obj)
    np.savez(OUT / "pose_stream.npz", **streams)


# ------------------------------------------------- 6. forward-warp C kernel
def gen_forward_warp():
    import ctypes
    lib = ctypes.cdll.LoadLibrary(
        os.path.join(REFERENCE, "external/forward_warping/libwarping.so"))
    rng = np.random.RandomState(SEED + 4)
    h, w = 24, 32
    src = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    idx = rng.randint(0, w, (h, w)).astype(np.int64)
    idy = rng.randint(0, h, (h, w)).astype(np.int64)
    z = (rng.rand(h, w) * 10).astype(np.float32)
    warped = np.zeros(h * w * 5, np.uint8)
    lib.forward_warping(
        ctypes.c_void_p(src.ctypes.data), ctypes.c_void_p(idx.ctypes.data),
        ctypes.c_void_p(idy.ctypes.data), ctypes.c_void_p(z.ctypes.data),
        ctypes.c_void_p(warped.ctypes.data), ctypes.c_int(h), ctypes.c_int(w))
    warped = warped.reshape(h, w, 5)
    np.savez(OUT / "forward_warp.npz", src=src, idx=idx, idy=idy, z=z,
             warped=warped)


# ------------------------------------------------- 7. bilateral filter
def gen_bilateral():
    import bilateral_filter as bf
    rng = np.random.RandomState(SEED + 5)
    disp = rng.rand(20, 26).astype(np.float64)
    disp[8:, :] += 1.0  # a depth discontinuity
    out = bf.sparse_bilateral_filtering(disp.copy(), filter_size=[5, 5], num_iter=2)
    np.savez(OUT / "bilateral.npz", disp=disp, out=np.asarray(out))


if __name__ == "__main__":
    torch.manual_seed(0)
    for fn in (gen_se3, gen_homography, gen_volume_render, gen_e2e,
               gen_pose_stream, gen_forward_warp, gen_bilateral):
        try:
            fn()
            print(f"{fn.__name__}: ok")
        except Exception as e:
            print(f"{fn.__name__}: FAILED: {type(e).__name__}: {e}")
    print("golden fixtures written to", OUT)
