"""Optical-flow / depth file codecs.

Bit-compatible with the reference's formats (reference: write_flow.py):
  * Middlebury .flo      -- tag 202021.25 f32, W/H i32 LE, interleaved u,v f32
                            (write_flow.py:74-103, :14-33)
  * KITTI PNG16 flow     -- uint16 BGR png, (u,v)*64 + 2^15, valid channel
                            (write_flow.py:106-125)
  * KITTI PNG16 disparity (write_flow.py:114-118)
  * PFM                  (write_flow.py:36-71)
  * Sintel .dpt depth    (write_flow.py:146-156)

All functions are host-side numpy; no torch/cv2 hard dependency (PNG16 goes
through cv2 when present, else through PIL).
"""
from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np

TAG_FLOAT = 202021.25
_TAG_BYTES = np.array([TAG_FLOAT], dtype="<f4").tobytes()


def write_flo(filename: str, uv: np.ndarray, v: Optional[np.ndarray] = None) -> None:
    """Write Middlebury .flo. Matches reference write_flow.py:74-103 byte-for-byte."""
    if v is None:
        if uv.ndim != 3 or uv.shape[2] != 2:
            raise ValueError(f"expected [H,W,2] flow, got {uv.shape}")
        u, v = uv[:, :, 0], uv[:, :, 1]
    else:
        u = uv
    if u.shape != v.shape:
        raise ValueError("u and v must have the same shape")
    height, width = u.shape
    interleaved = np.empty((height, width * 2), dtype="<f4")
    interleaved[:, 0::2] = u
    interleaved[:, 1::2] = v
    with open(filename, "wb") as f:
        f.write(_TAG_BYTES)
        f.write(np.array([width], dtype="<i4").tobytes())
        f.write(np.array([height], dtype="<i4").tobytes())
        f.write(interleaved.tobytes())


def read_flo(filename: str) -> Optional[np.ndarray]:
    """Read Middlebury .flo as [H,W,2] float32 (reference write_flow.py:14-33)."""
    with open(filename, "rb") as f:
        magic = np.frombuffer(f.read(4), dtype="<f4")
        if magic.size == 0 or magic[0] != TAG_FLOAT:
            return None
        w = int(np.frombuffer(f.read(4), dtype="<i4")[0])
        h = int(np.frombuffer(f.read(4), dtype="<i4")[0])
        data = np.frombuffer(f.read(4 * 2 * w * h), dtype="<f4")
    return data.reshape(h, w, 2).copy()


def _imread_png16(filename: str) -> np.ndarray:
    """Read a 16-bit PNG as-is (BGR order if 3-channel, matching cv2)."""
    try:
        import cv2
        img = cv2.imread(filename, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"failed to read {filename}")
        return img
    except ImportError:
        from PIL import Image
        arr = np.array(Image.open(filename))
        if arr.ndim == 3:  # PIL gives RGB; convert to BGR for cv2 compat
            arr = arr[:, :, ::-1]
        return arr


def _imwrite_png16(filename: str, bgr_u16: np.ndarray) -> None:
    try:
        import cv2
        if not cv2.imwrite(filename, bgr_u16):
            raise IOError(f"failed to write {filename}")
    except ImportError:
        from PIL import Image
        rgb = bgr_u16[:, :, ::-1] if bgr_u16.ndim == 3 else bgr_u16
        Image.fromarray(rgb).save(filename)


def read_flow_kitti(filename: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read KITTI PNG16 flow -> (flow [H,W,2] f32, valid [H,W]). Ref write_flow.py:106-111."""
    flow = _imread_png16(filename)
    flow = flow[:, :, ::-1].astype(np.float32)  # BGR -> RGB = (u, v, valid)
    flow, valid = flow[:, :, :2], flow[:, :, 2]
    flow = (flow - 2 ** 15) / 64.0
    return flow, valid


def write_flow_kitti(filename: str, uv: np.ndarray) -> None:
    """Write KITTI PNG16 flow (reference write_flow.py:121-125)."""
    uv = 64.0 * uv + 2 ** 15
    valid = np.ones([uv.shape[0], uv.shape[1], 1])
    uv = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    _imwrite_png16(filename, uv[..., ::-1])


def read_disp_kitti(filename: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read KITTI PNG16 disparity as pseudo-flow (reference write_flow.py:114-118)."""
    try:
        import cv2
        disp = cv2.imread(filename, cv2.IMREAD_ANYDEPTH)
    except ImportError:
        from PIL import Image
        disp = np.array(Image.open(filename))
    disp = disp / 256.0
    valid = disp > 0.0
    flow = np.stack([-disp, np.zeros_like(disp)], -1)
    return flow, valid


def read_pfm(filename: str) -> np.ndarray:
    """Read PFM (reference write_flow.py:36-71)."""
    with open(filename, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dim_match = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dim_match:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dim_match.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape))


def write_pfm(filename: str, data: np.ndarray, scale: float = 1.0) -> None:
    """Write PFM (little-endian)."""
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 3 and data.shape[2] == 3:
        color = True
    elif data.ndim == 2 or (data.ndim == 3 and data.shape[2] == 1):
        color = False
        data = data.reshape(data.shape[0], data.shape[1])
    else:
        raise ValueError("PFM data must be HxW, HxWx1 or HxWx3")
    with open(filename, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())  # negative => little-endian
        np.flipud(data).astype("<f4").tofile(f)


def depth_read(filename: str) -> np.ndarray:
    """Read Sintel .dpt depth (reference write_flow.py:146-156)."""
    with open(filename, "rb") as f:
        check = np.frombuffer(f.read(4), dtype=np.float32)[0]
        if check != TAG_FLOAT:
            raise ValueError(f"wrong tag in depth file ({check} != {TAG_FLOAT})")
        width = int(np.frombuffer(f.read(4), dtype=np.int32)[0])
        height = int(np.frombuffer(f.read(4), dtype=np.int32)[0])
        depth = np.frombuffer(f.read(4 * width * height), dtype=np.float32)
    return depth.reshape(height, width).copy()


def read_gen(file_name: str):
    """Dispatch on extension (reference write_flow.py:128-143)."""
    ext = os.path.splitext(file_name)[-1].lower()
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        from PIL import Image
        return Image.open(file_name)
    if ext in (".bin", ".raw"):
        return np.load(file_name)
    if ext == ".flo":
        return read_flo(file_name).astype(np.float32)
    if ext == ".pfm":
        flow = read_pfm(file_name).astype(np.float32)
        return flow if flow.ndim == 2 else flow[:, :, :-1]
    raise ValueError(f"wrong file type: {ext}")
