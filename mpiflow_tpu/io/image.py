"""Image / disparity / mask loading, matching reference preprocessing.

reference:
  * image_to_tensor        (utils/utils.py:35-39)  PIL RGB -> float [0,1]
  * disparity_to_tensor    (utils/utils.py:42-52)  grayscale PNG / 255
  * mask loading           (gen_3dphoto_dynamic_v2.py:83)  PIL "L"
  * final image writing    (utils/utils.py:174-177) round(x*255) clip -> u8
"""
from __future__ import annotations

import numpy as np


def load_image(path: str) -> np.ndarray:
    """Load an RGB image as float32 [H,W,3] in [0,1]."""
    from PIL import Image
    rgb = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return rgb


def load_disparity(path: str) -> np.ndarray:
    """Load a grayscale disparity PNG as float32 [H,W] in [0,1].

    The reference reads via cv2.imread(path, 0)/255 (utils/utils.py:43); for
    8-bit grayscale PNGs PIL's "L" conversion yields identical values.
    """
    try:
        import cv2
        disp = cv2.imread(path, 0)
        if disp is None:
            raise IOError(f"failed to read {path}")
    except ImportError:
        from PIL import Image
        disp = np.asarray(Image.open(path).convert("L"))
    return disp.astype(np.float32) / 255.0


def load_disparity_16bit(path: str) -> np.ndarray:
    """Load a 16-bit disparity PNG normalized to [0,1] (warpback/utils.py:231-236)."""
    try:
        import cv2
        disp = cv2.imread(path, -1)
        if disp is None:
            raise IOError(f"failed to read {path}")
    except ImportError:
        from PIL import Image
        disp = np.asarray(Image.open(path))
    return disp.astype(np.float32) / (2 ** 16 - 1)


def load_mask(path: str) -> np.ndarray:
    """Load an instance-id mask as uint8 [H,W] (gen_3dphoto_dynamic_v2.py:83)."""
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"))


def to_u8(img01: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with the reference's round-then-clip (utils/utils.py:175)."""
    return np.clip(np.round(np.asarray(img01, dtype=np.float32) * 255.0),
                   0, 255).astype(np.uint8)


def save_image_u8(path: str, img: np.ndarray, fast: bool = True) -> None:
    """Save an RGB (or grayscale) uint8 image as PNG.

    fast=True uses zlib level 1 (~3x faster encode, ~15% larger files) --
    PNG encoding runs on host CPU and competes with the input pipeline."""
    try:
        import cv2
        bgr = img[:, :, ::-1] if img.ndim == 3 else img
        flags = [cv2.IMWRITE_PNG_COMPRESSION, 1] if fast else []
        if not cv2.imwrite(path, bgr, flags):
            raise IOError(f"failed to write {path}")
    except ImportError:
        from PIL import Image
        Image.fromarray(img).save(path,
                                  compress_level=1 if fast else 6)
