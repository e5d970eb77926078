"""Flow-training augmentation, numpy host-side (torch/torchvision-free).

Same augmentation family and distributions as the reference
(RAFT/core/utils/augmentor.py): photometric jitter (asymmetric w.p. 0.2),
eraser occlusion (w.p. 0.5, 1-2 boxes of 50-100px filled with the mean
color), random scale/stretch (2^U(min,max), stretch w.p. 0.8), flips, crop.
Sparse variant handles KITTI-style sparse flow with nearest-splat rescaling.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _resize_linear(img: np.ndarray, fx: float, fy: float) -> np.ndarray:
    try:
        import cv2
        return cv2.resize(img, None, fx=fx, fy=fy,
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image
        h, w = img.shape[:2]
        out = np.asarray(Image.fromarray(img).resize(
            (int(round(w * fx)), int(round(h * fy))), Image.BILINEAR))
        return out


def _rgb_to_gray(img: np.ndarray) -> np.ndarray:
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def _color_jitter(rng: np.random.RandomState, img: np.ndarray,
                  brightness: float, contrast: float, saturation: float,
                  hue: float) -> np.ndarray:
    """torchvision-ColorJitter-style photometric jitter on uint8 HWC."""
    x = img.astype(np.float32)
    ops = rng.permutation(4)
    for op in ops:
        if op == 0 and brightness > 0:
            f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
            x = x * f
        elif op == 1 and contrast > 0:
            f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
            mean = _rgb_to_gray(np.clip(x, 0, 255)).mean()
            x = (x - mean) * f + mean
        elif op == 2 and saturation > 0:
            f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
            gray = _rgb_to_gray(np.clip(x, 0, 255))
            x = (x - gray) * f + gray
        elif op == 3 and hue > 0:
            shift = rng.uniform(-hue, hue)
            x = _hue_shift(np.clip(x, 0, 255), shift)
    return np.clip(x, 0, 255).astype(np.uint8)


def _hue_shift(x: np.ndarray, shift: float) -> np.ndarray:
    """Shift hue by `shift` (fraction of the full hue circle).

    HSV->RGB is evaluated with the branch-free triangle-wave form
    channel_n = V - C*clip(min(k, 4-k), 0, 1), k = (n + 6h) mod 6 --
    mathematically identical to the 6-sector table (q/t/p cases) but with
    no np.select / np.stack / materialized sector masks. The sector form
    profiled at ~340 ms per KITTI frame on one host core (np.select
    dominated), making the TRAIN LOADER the pipeline bottleneck; this form
    is ~6x cheaper (same <=1e-2 parity vs the colorsys round-trip,
    tests/test_round2_fixes.py)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    c = mx - mn
    inv_c = 1.0 / np.where(c == 0, 1.0, c)
    h = np.where(mx == r, ((g - b) * inv_c) % 6,
                 np.where(mx == g, (b - r) * inv_c + 2,
                          (r - g) * inv_c + 4)) / 6.0
    h = np.where(c == 0, 0.0, h)
    h6 = ((h + shift) % 1.0) * 6.0
    out = np.empty_like(x)
    for ch, n in ((0, 5.0), (1, 3.0), (2, 1.0)):
        k = (n + h6) % 6.0
        out[..., ch] = mx - c * np.clip(np.minimum(k, 4.0 - k), 0.0, 1.0)
    return out


class FlowAugmentor:
    """Dense-flow augmentation (augmentor.py:15-120 distributions)."""

    def __init__(self, crop_size: Tuple[int, int], min_scale=-0.2,
                 max_scale=0.5, do_flip=True, seed=None):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 0.8
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.jitter = dict(brightness=0.4, contrast=0.4, saturation=0.4,
                           hue=0.5 / 3.14)
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = 0.5
        self.rng = np.random.RandomState(seed)

    def color_transform(self, img1, img2):
        if self.rng.rand() < self.asymmetric_color_aug_prob:
            img1 = _color_jitter(self.rng, img1, **self.jitter)
            img2 = _color_jitter(self.rng, img2, **self.jitter)
        else:
            stack = _color_jitter(self.rng, np.concatenate([img1, img2], 0),
                                  **self.jitter)
            img1, img2 = np.split(stack, 2, axis=0)
        return img1, img2

    def eraser_transform(self, img1, img2, bounds=(50, 100)):
        ht, wd = img1.shape[:2]
        if self.rng.rand() < self.eraser_aug_prob:
            img2 = img2.copy()
            mean_color = img2.reshape(-1, 3).mean(0)
            for _ in range(self.rng.randint(1, 3)):
                x0 = self.rng.randint(0, wd)
                y0 = self.rng.randint(0, ht)
                dx = self.rng.randint(bounds[0], bounds[1])
                dy = self.rng.randint(bounds[0], bounds[1])
                img2[y0:y0 + dy, x0:x0 + dx, :] = mean_color
        return img1, img2

    def spatial_transform(self, img1, img2, flow):
        ht, wd = img1.shape[:2]
        min_scale = max((self.crop_size[0] + 8) / float(ht),
                        (self.crop_size[1] + 8) / float(wd))
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = scale
        if self.rng.rand() < self.stretch_prob:
            scale_x *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
            scale_y *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
        scale_x = max(scale_x, min_scale)
        scale_y = max(scale_y, min_scale)

        if self.rng.rand() < self.spatial_aug_prob:
            img1 = _resize_linear(img1, scale_x, scale_y)
            img2 = _resize_linear(img2, scale_x, scale_y)
            flow = _resize_linear(flow, scale_x, scale_y)
            flow = flow * [scale_x, scale_y]
        else:
            # crop must fit; rescale anyway if the image is too small
            if ht < self.crop_size[0] + 1 or wd < self.crop_size[1] + 1:
                img1 = _resize_linear(img1, min_scale, min_scale)
                img2 = _resize_linear(img2, min_scale, min_scale)
                flow = _resize_linear(flow, min_scale, min_scale) * min_scale

        if self.do_flip:
            if self.rng.rand() < self.h_flip_prob:
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
            if self.rng.rand() < self.v_flip_prob:
                img1, img2 = img1[::-1], img2[::-1]
                flow = flow[::-1] * [1.0, -1.0]

        y0 = self.rng.randint(0, img1.shape[0] - self.crop_size[0])
        x0 = self.rng.randint(0, img1.shape[1] - self.crop_size[1])
        sl = np.s_[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1[sl], img2[sl], flow[sl]

    def __call__(self, img1, img2, flow):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow = self.spatial_transform(img1, img2, flow)
        return (np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                np.ascontiguousarray(flow))


class SparseFlowAugmentor(FlowAugmentor):
    """KITTI-style sparse flow (augmentor.py:122-246)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5,
                 do_flip=False, seed=None):
        super().__init__(crop_size, min_scale, max_scale, do_flip, seed)
        self.jitter = dict(brightness=0.3, contrast=0.3, saturation=0.3,
                           hue=0.3 / 3.14)

    def color_transform(self, img1, img2):  # always symmetric
        stack = _color_jitter(self.rng, np.concatenate([img1, img2], 0),
                              **self.jitter)
        return tuple(np.split(stack, 2, axis=0))

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx, fy):
        """Rescale a sparse flow field by point splatting.

        Bilinear resampling would blend valid with invalid pixels, so a
        sparse (KITTI-style) field is rescaled vector-wise instead: each
        valid pixel's coordinate and flow vector are scaled, snapped to
        the nearest output pixel, and splatted onto an empty canvas.
        Collisions resolve last-writer-wins in row-major source order
        and output pixels on the row-0/col-0 border stay invalid, both
        matching the reference splat
        (RAFT/core/utils/augmentor.py:161-194).
        """
        h_out = int(round(flow.shape[0] * fy))
        w_out = int(round(flow.shape[1] * fx))
        src_y, src_x = np.nonzero(np.asarray(valid) >= 1)
        vec = flow[src_y, src_x].astype(np.float32) * np.array([fx, fy])
        out_x = np.round(src_x.astype(np.float32) * fx).astype(np.int32)
        out_y = np.round(src_y.astype(np.float32) * fy).astype(np.int32)
        keep = ((out_x > 0) & (out_x < w_out) &
                (out_y > 0) & (out_y < h_out))
        flow_out = np.zeros((h_out, w_out, 2), np.float32)
        valid_out = np.zeros((h_out, w_out), np.int32)
        flow_out[out_y[keep], out_x[keep]] = vec[keep]
        valid_out[out_y[keep], out_x[keep]] = 1
        return flow_out, valid_out

    def spatial_transform(self, img1, img2, flow, valid):
        ht, wd = img1.shape[:2]
        min_scale = max((self.crop_size[0] + 1) / float(ht),
                        (self.crop_size[1] + 1) / float(wd))
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = max(scale, min_scale)

        if self.rng.rand() < self.spatial_aug_prob:
            img1 = _resize_linear(img1, scale_x, scale_y)
            img2 = _resize_linear(img2, scale_x, scale_y)
            flow, valid = self.resize_sparse_flow_map(flow, valid, scale_x,
                                                      scale_y)
        if self.do_flip and self.rng.rand() < 0.5:
            img1, img2 = img1[:, ::-1], img2[:, ::-1]
            flow = flow[:, ::-1] * [-1.0, 1.0]
            valid = valid[:, ::-1]

        margin_y, margin_x = 20, 50
        y0 = self.rng.randint(0, img1.shape[0] - self.crop_size[0] + margin_y)
        x0 = self.rng.randint(-margin_x,
                              img1.shape[1] - self.crop_size[1] + margin_x)
        y0 = int(np.clip(y0, 0, img1.shape[0] - self.crop_size[0]))
        x0 = int(np.clip(x0, 0, img1.shape[1] - self.crop_size[1]))
        sl = np.s_[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1[sl], img2[sl], flow[sl], valid[sl]

    def __call__(self, img1, img2, flow, valid):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow, valid = self.spatial_transform(img1, img2, flow,
                                                         valid)
        return tuple(np.ascontiguousarray(a) for a in (img1, img2, flow, valid))
