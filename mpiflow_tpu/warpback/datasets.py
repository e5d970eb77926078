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


class WarpbackStage2(_WarpbackBase):
    """(inpainted novel view, original view) supervision pairs for MPI
    training (stage2_dataset.py:145-175)."""

    def __init__(self, data_root: str, ec_params=None, **kw):
        super().__init__(data_root, **kw)
        self.ec = ec_params  # {edge, inpaint, disp} trees or None

    def _inpaint(self, image, disp, mask):
        """EdgeConnect hole filling (stage2_dataset.py:113-133). NCHW in."""
        from mpiflow_tpu.models.edgeconnect import (edge_generator,
                                                    inpaint_generator)
        from mpiflow_tpu.ops.canny import canny_edges
        # torchvision Grayscale coefficients (the reference applies
        # transforms.Grayscale(), stage2_dataset.py:114)
        gray = (0.2989 * image[0] + 0.587 * image[1] + 0.114 * image[2])
        edge = canny_edges(gray, sigma=2.0, mask=mask)
        hole = 1.0 - mask

        nhwc = lambda x: x.transpose(1, 2, 0)[None]
        edge_in = jnp.concatenate([nhwc(gray[None]), nhwc(edge[None]),
                                   nhwc(hole[None])], axis=-1)
        edge_fill = edge_generator(self.ec["edge"], edge_in)[0, ..., 0]

        img_in = jnp.concatenate([nhwc(image + hole[None]),
                                  nhwc(edge_fill[None])], axis=-1)
        img_fill = inpaint_generator(self.ec["inpaint"], img_in)[0]
        img_fill = img_fill.transpose(2, 0, 1)
        image_merged = image * mask[None] + img_fill * hole[None]

        disp_in = jnp.concatenate([nhwc((disp + hole)[None]),
                                   nhwc(edge_fill[None])], axis=-1)
        disp_fill = inpaint_generator(self.ec["disp"], disp_in)[0, ..., 0]
        disp_merged = disp * mask + disp_fill * hole
        return image_merged, disp_merged

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
