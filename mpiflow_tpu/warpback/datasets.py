"""Warpback training-pair synthesis (AdaMPI's training-data pipeline).

TPU-native equivalents of the reference's two dataset stages:

  * Stage 1 (warpback/stage1_dataset.py): warp the RGBD image to a random
    pose and back; the warp-back holes give (image, disp, mask) triples for
    training EdgeConnect-style inpainting networks.
  * Stage 2 (warpback/stage2_dataset.py): warp to a random pose, fill holes
    with the pretrained EdgeConnect trio (edge -> RGB -> disparity), and
    return (src=inpainted novel view, tgt=original, K, ext) pairs for
    warp-back-supervised MPI-predictor training.

The reference runs the CUDA mesh rasterizer and the inpainters inside the
DataLoader's collate_fn (an implicit num_workers=0 constraint, SURVEY.md §5);
here the whole batch synthesis is one jitted function over the device batch.
Pose sampling matches rand_tensor (stage1_dataset.py:92-100): each component
uniform in [-r,-r/2] u [r/2,r] keyed by trans_range (x=0.2 default, -1
disables an axis).
"""
from __future__ import annotations

import glob
import math
import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from mpiflow_tpu.geom.se3 import transformation_from_parameters
from mpiflow_tpu.io.image import load_image, load_disparity_16bit
from mpiflow_tpu.ops.resample import resize_bilinear
from mpiflow_tpu.warpback.renderer import rgbd_render

DEFAULT_TRANS_RANGE = {"x": 0.2, "y": -1, "z": -1, "a": -1, "b": -1, "c": -1}
K_NORM = np.array([[0.58, 0, 0.5], [0, 0.58, 0.5], [0, 0, 1]], np.float32)


def rand_range_tensor(rng: np.random.RandomState, r: float) -> float:
    """rand_tensor (stage1_dataset.py:92-100): U([-r,-r/2] u [r/2,r])."""
    if r < 0:
        return 0.0
    sign = 1.0 if rng.randn() > 0 else -1.0
    return float(sign * (r / 2 + r / 2 * rng.rand()))


def sample_warpback_pose(rng: np.random.RandomState,
                         trans_range: Dict[str, float]):
    """get_rand_ext (stage1_dataset.py:75-90). Returns (ext [4,4], inv)."""
    t = np.array([rand_range_tensor(rng, trans_range["x"]),
                  rand_range_tensor(rng, trans_range["y"]),
                  rand_range_tensor(rng, trans_range["z"])], np.float32)
    a = np.array([rand_range_tensor(rng, math.pi / trans_range["a"])
                  if trans_range["a"] > 0 else 0.0,
                  rand_range_tensor(rng, math.pi / trans_range["b"])
                  if trans_range["b"] > 0 else 0.0,
                  rand_range_tensor(rng, math.pi / trans_range["c"])
                  if trans_range["c"] > 0 else 0.0], np.float32)
    ext = np.asarray(transformation_from_parameters(a, t))
    return ext, np.linalg.inv(ext.astype(np.float64)).astype(np.float32)


class _WarpbackBase:
    def __init__(self, data_root: str, width: int = 384, height: int = 256,
                 depth_dir_name: str = "dpt_depth",
                 trans_range: Optional[Dict[str, float]] = None,
                 seed: int = 0):
        self.data_root = data_root
        self.depth_dir_name = depth_dir_name
        self.width, self.height = width, height
        self.trans_range = dict(DEFAULT_TRANS_RANGE, **(trans_range or {}))
        self.rng = np.random.RandomState(seed)
        self.paths = sorted(glob.glob(os.path.join(data_root, "*.jpg"))
                            + glob.glob(os.path.join(data_root, "*.png")))
        self.K = jnp.asarray(K_NORM)

    def __len__(self):
        return len(self.paths)

    def load_rgbd(self, idx: int):
        path = self.paths[idx]
        name = os.path.splitext(os.path.basename(path))[0]
        disp_path = os.path.join(self.data_root, self.depth_dir_name,
                                 f"{name}.png")
        rgb = jnp.asarray(load_image(path).transpose(2, 0, 1))
        disp = jnp.asarray(load_disparity_16bit(disp_path))
        rgb = resize_bilinear(rgb, self.height, self.width)
        disp = resize_bilinear(disp[None], self.height, self.width)[0]
        return rgb, disp


class WarpbackStage1(_WarpbackBase):
    """(image, disp, hole-mask) triples for inpainter training
    (stage1_dataset.py:103-135)."""

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rgb, disp = self.load_rgbd(idx)
        ext, ext_inv = sample_warpback_pose(self.rng, self.trans_range)
        warp_rgb, warp_disp, warp_mask = rgbd_render(
            rgb, disp, self.K, jnp.asarray(ext))
        back_rgb, back_disp, back_mask = rgbd_render(
            warp_rgb, warp_disp, self.K, jnp.asarray(ext_inv))
        return {
            "rgb": np.asarray(rgb), "disp": np.asarray(disp),
            "mask": np.asarray(back_mask),
            "warp_rgb": np.asarray(warp_rgb),
            "warp_disp": np.asarray(warp_disp),
            "warp_back_rgb": np.asarray(back_rgb),
            "warp_back_disp": np.asarray(back_disp),
        }


def inpaint_rgbd_batch(ec_params: Dict, image: jnp.ndarray,
                       disp: jnp.ndarray, mask: jnp.ndarray):
    """EdgeConnect hole filling (stage2_dataset.py:113-133), whole batch.

    image [B,3,H,W], disp [B,H,W], mask [B,H,W] (1 = valid). Returns
    (image_merged [B,3,H,W], disp_merged [B,H,W]). Pure jnp — jit/vmap safe.
    """
    import jax
    from mpiflow_tpu.models.edgeconnect import (edge_generator,
                                                inpaint_generator)
    from mpiflow_tpu.ops.canny import canny_edges
    # torchvision Grayscale coefficients (the reference applies
    # transforms.Grayscale(), stage2_dataset.py:114)
    # The renderer hands back a fractional visibility mask; the reference
    # chain (and the committed golden, gen_stage2_golden.py) binarize it at
    # 0.5 before inpainting — match that so boundary pixels get the same
    # hard image+hole inputs the golden parity test exercises.
    mask = (mask > 0.5).astype(image.dtype)
    gray = (0.2989 * image[:, 0] + 0.587 * image[:, 1]
            + 0.114 * image[:, 2])                                # [B,H,W]
    edge = jax.vmap(lambda g, m: canny_edges(g, sigma=2.0, mask=m))(
        gray, mask)
    hole = 1.0 - mask

    edge_in = jnp.stack([gray, edge, hole], axis=-1)              # [B,H,W,3]
    edge_fill = edge_generator(ec_params["edge"], edge_in)[..., 0]

    img_nhwc = image.transpose(0, 2, 3, 1)
    img_in = jnp.concatenate([img_nhwc + hole[..., None],
                              edge_fill[..., None]], axis=-1)
    img_fill = inpaint_generator(ec_params["inpaint"], img_in)
    image_merged = (img_nhwc * mask[..., None]
                    + img_fill * hole[..., None]).transpose(0, 3, 1, 2)

    disp_in = jnp.stack([disp + hole, edge_fill], axis=-1)
    disp_fill = inpaint_generator(ec_params["disp"], disp_in)[..., 0]
    disp_merged = disp * mask + disp_fill * hole
    return image_merged, disp_merged


def make_stage2_synthesizer(ec_params: Optional[Dict],
                            supersample: int = 3,
                            diffusion_iters: int = 64):
    """The whole stage-2 batch synthesis as ONE jitted function.

    The reference runs mesh-raster + three inpainter forwards per sample
    inside the DataLoader collate (stage2_dataset.py:145-175, implicitly
    serialized); here (render -> canny -> EdgeConnect trio -> merge) runs
    batched on device. Returns synth(rgb [B,3,H,W], disp [B,H,W],
    ext [B,4,4]) -> dict of src/tgt/warp arrays (NCHW, leading B).

    ec_params=None fills holes by harmonic diffusion instead of the
    EdgeConnect trio (the published inpainter weights are stripped from
    the snapshot, .MISSING_LARGE_BLOBS) — same fused-batch structure, and
    the fill is content-derived rather than random-weight noise, which is
    what the AdaMPI training loop (train/adampi_train.py) wants.
    """
    import jax
    K = jnp.asarray(K_NORM)

    @jax.jit
    def synth(rgb, disp, ext):
        wr, wd, wm = jax.vmap(
            lambda r, d, e: rgbd_render(r, d, K, e, supersample))(
                rgb, disp, ext)
        if ec_params is not None:
            src_rgb, src_disp = inpaint_rgbd_batch(ec_params, wr, wd, wm)
        else:
            from mpiflow_tpu.ops.inpaint import diffusion_inpaint
            hole = wm < 0.5                                    # [B,H,W]
            src_rgb = jax.vmap(
                lambda r, h: diffusion_inpaint(
                    r.transpose(1, 2, 0), h, diffusion_iters
                ).transpose(2, 0, 1))(wr, hole)
            src_disp = jax.vmap(
                lambda d, h: diffusion_inpaint(
                    d[..., None], h, diffusion_iters)[..., 0])(wd, hole)
        return {"src_rgb": src_rgb, "src_disp": src_disp,
                "tgt_rgb": rgb, "tgt_disp": disp,
                "warp_rgb": wr, "warp_disp": wd, "warp_mask": wm}

    return synth


def random_edgeconnect_params(seed: int = 0, manifest_path: str = None):
    """Random parameters at the PUBLISHED EdgeConnect layouts, from the
    committed shape manifests (tests/golden/data/edgeconnect.npz). The three
    published .pth files are stripped from the snapshot
    (.MISSING_LARGE_BLOBS) and unfetchable here; synthesis throughput is
    set by the compute graph, not the weight values. The disparity
    inpainter shares the InpaintGenerator trunk with 2->1 channels
    (warpback/networks.py:11-26)."""
    from mpiflow_tpu.models.torch_convert import convert_state_dict
    if manifest_path is None:
        here = os.path.dirname(os.path.abspath(__file__))
        manifest_path = os.path.join(here, "..", "..", "tests", "golden",
                                     "data", "edgeconnect.npz")
    g = np.load(manifest_path)

    def sd_from(keys, shapes, seed, reshape=()):
        reshape = dict(reshape)
        rng = np.random.RandomState(seed)
        sd = {}
        for k, s in zip(keys, shapes):
            k = str(k)
            shape = tuple(int(x) for x in str(s).split(",") if x)
            sd[k] = (rng.randn(*reshape.get(k, shape)) * 0.05
                     ).astype(np.float32)
        return sd

    inp_k, inp_s = g["inp_keys"], g["inp_shapes"]
    out = {
        "inpaint": convert_state_dict(sd_from(inp_k, inp_s, seed)),
        "edge": convert_state_dict(
            sd_from(g["edge_keys"], g["edge_shapes"], seed + 1)),
        # disparity variant: 2-channel input, 1-channel output
        "disp": convert_state_dict(sd_from(inp_k, inp_s, seed + 2, reshape={
            "encoder.1.weight": (64, 2, 7, 7),
            "decoder.7.weight": (1, 64, 7, 7),
            "decoder.7.bias": (1,)})),
    }
    return {name: {k: jnp.asarray(v) for k, v in tree.items()}
            for name, tree in out.items()}


class WarpbackStage2(_WarpbackBase):
    """(inpainted novel view, original view) supervision pairs for MPI
    training (stage2_dataset.py:145-175)."""

    def __init__(self, data_root: str, ec_params=None, **kw):
        super().__init__(data_root, **kw)
        self.ec = ec_params  # {edge, inpaint, disp} trees or None

    def _inpaint(self, image, disp, mask):
        """EdgeConnect hole filling for one sample. NCHW in."""
        img, dsp = inpaint_rgbd_batch(self.ec, image[None], disp[None],
                                      mask[None])
        return img[0], dsp[0]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rgb, disp = self.load_rgbd(idx)
        ext, ext_inv = sample_warpback_pose(self.rng, self.trans_range)
        warp_rgb, warp_disp, warp_mask = rgbd_render(
            rgb, disp, self.K, jnp.asarray(ext))
        if self.ec is not None:
            src_rgb, src_disp = self._inpaint(warp_rgb, warp_disp, warp_mask)
        else:  # no pretrained inpainters: diffusion-fill the holes
            from mpiflow_tpu.ops.inpaint import diffusion_inpaint
            hole = warp_mask < 0.5
            src_rgb = diffusion_inpaint(warp_rgb.transpose(1, 2, 0), hole,
                                        64).transpose(2, 0, 1)
            src_disp = diffusion_inpaint(warp_disp[..., None], hole, 64)[..., 0]
        return {
            "src_rgb": np.asarray(src_rgb), "src_disp": np.asarray(src_disp),
            "tgt_rgb": np.asarray(rgb), "tgt_disp": np.asarray(disp),
            "warp_rgb": np.asarray(warp_rgb),
            "warp_disp": np.asarray(warp_disp),
            "cam_int": np.asarray(self.K), "cam_ext": ext_inv,
        }
