"""Procedural RGBD test scenes (shared by quality_loop and train_adampi).

A textured background with a road-like disparity ramp plus 1-3 textured
foreground objects at nearer constant disparity — the same scene family
the quality loop trains on (cli/quality_loop.py), returned as arrays so
callers that never touch the filesystem (the AdaMPI trainer's synthetic
mode) can consume them directly.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def smooth_texture(rng: np.random.RandomState, h: int, w: int, cells: int,
                   channels: int = 3) -> np.ndarray:
    """Low-frequency noise upsampled to (h, w): [h,w,channels] in [0,1]
    (channels=1 squeezes to [h,w,1])."""
    from PIL import Image
    low = rng.rand(cells, max(1, int(cells * w / h)), channels).squeeze()
    img = np.asarray(Image.fromarray(
        (low * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR))
    if img.ndim == 2:
        img = img[..., None]
    return img.astype(np.float32) / 255.0


def procedural_scene(rng: np.random.RandomState, height: int, width: int
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One scene: (img [H,W,3] f32 in [0,1], disp [H,W] f32 in ~[0.2,1],
    mask [H,W] uint8 with instance ids 1..k — the layout
    gen_3dphoto_dynamic_v2.py:74-78 consumes)."""
    h, w = height, width
    img = (smooth_texture(rng, h, w, cells=6) * 0.7
           + smooth_texture(rng, h, w, cells=24) * 0.3)
    img += rng.randn(h, w, 3).astype(np.float32) * 0.02  # fine matchable grain
    # road-like ramp: near (high disparity) at the bottom
    ramp = np.linspace(0.2, 0.8, h, dtype=np.float32)[:, None] * np.ones(
        (h, w), np.float32)
    ramp += smooth_texture(rng, h, w, cells=4, channels=1)[..., 0] * 0.1
    disp = ramp
    mask = np.zeros((h, w), np.uint8)
    for k in range(1, rng.randint(2, 4)):
        ow = rng.randint(w // 8, w // 3)
        oh = rng.randint(h // 6, h // 2)
        oy = rng.randint(0, h - oh)
        ox = rng.randint(0, w - ow)
        yy, xx = np.mgrid[0:oh, 0:ow]
        if rng.rand() < 0.5:
            sel = np.ones((oh, ow), bool)
        else:  # ellipse
            sel = (((yy - oh / 2) / (oh / 2)) ** 2
                   + ((xx - ow / 2) / (ow / 2)) ** 2) <= 1.0
        tex = smooth_texture(rng, oh, ow, cells=5)
        region = img[oy:oy + oh, ox:ox + ow]
        region[sel] = tex[sel] * 0.8 + rng.rand(3).astype(np.float32) * 0.2
        obj_disp = rng.uniform(0.55, 0.95)
        disp[oy:oy + oh, ox:ox + ow][sel] = obj_disp
        mask[oy:oy + oh, ox:ox + ow][sel] = k
    return np.clip(img, 0.0, 1.0), disp, mask
