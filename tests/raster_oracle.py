"""Slow numpy triangle-rasterizer oracle for the warpback RGBD renderer.

Re-implements the reference's exact rendering pipeline
(warpback/utils.py:19-119 ``RGBDRenderer.construct_mesh``/``render_mesh``)
without pytorch3d, which cannot be installed in this environment:

  1. unproject every source pixel to a camera-space vertex via
     K_norm^-1 @ ((i+0.5)/W, (j+0.5)/H, 1) / (disp + 1e-4)   (:93-100)
  2. grid-triangulate 2 faces per pixel quad: (tl,bl,br), (br,tr,tl)
     (get_faces :150-172)
  3. vertex attributes = RGB + Sobel-edge visibility mask
     (get_visible_mask :174-192) + the target-frame vertex depth (:41-43)
  4. transform to the target view, project to pytorch3d-convention NDC
     (+x left, +y up, x scaled by w/h; get_perspective_from_intrinsic
     :194-218 with near=1e-4, far=1e4, then the sign flips at :50-52)
  5. rasterize with faces_per_pixel=1: at every pixel center, the face
     with the smallest barycentric-interpolated NDC z wins
     (rasterize_meshes(..., faces_per_pixel=1, blur_radius=1e-6) :56)
  6. interpolate the 5 attributes barycentrically (NOT perspective
     correct -- pytorch3d's default), then
     render = rgb * mask, disparity = 1/(depth + 1e-4) * mask  (:64-68)

This is test-only reference code: O(faces x bbox) python loop, meant for
tiny images. It is the golden oracle for
mpiflow_tpu.warpback.renderer.rgbd_render (tests/test_warpback.py), whose
supersampled-splat design approximates the same surface; the PARITY.md
entry states the agreed tolerances.
"""
from __future__ import annotations

import numpy as np

EPS = 1e-4
NEAR_Z = 1e-4
FAR_Z = 1e4


def sobel_visible_mask(disp: np.ndarray, beta: float = 10.0,
                       threshold: float = 0.3) -> np.ndarray:
    """get_visible_mask (warpback/utils.py:174-192): zero-padded 3x3 Sobel
    magnitude -> alpha = exp(-beta*mag) > threshold."""
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64)
    ky = kx.T
    H, W = disp.shape
    pad = np.zeros((H + 2, W + 2), np.float64)
    pad[1:-1, 1:-1] = disp
    gx = np.zeros((H, W), np.float64)
    gy = np.zeros((H, W), np.float64)
    for dy in range(3):
        for dx in range(3):
            win = pad[dy:dy + H, dx:dx + W]
            gx += kx[dy, dx] * win
            gy += ky[dy, dx] * win
    mag = np.sqrt(gx ** 2 + gy ** 2)
    return (np.exp(-beta * mag) > threshold).astype(np.float64)


def grid_faces(H: int, W: int) -> np.ndarray:
    """get_faces (warpback/utils.py:150-172): per quad, lower-left tri
    (tl,bl,br) then upper-right tri (br,tr,tl); all left tris first."""
    idx = np.arange(H * W).reshape(H, W)
    tl = idx[:-1, :-1].ravel()
    tr = idx[:-1, 1:].ravel()
    bl = idx[1:, :-1].ravel()
    br = idx[1:, 1:].ravel()
    faces_l = np.stack([tl, bl, br], axis=1)
    faces_r = np.stack([br, tr, tl], axis=1)
    return np.concatenate([faces_l, faces_r], axis=0)


def rasterize_rgbd_reference(rgb: np.ndarray, disp: np.ndarray,
                             K_norm: np.ndarray, cam_ext: np.ndarray):
    """Reference-semantics RGBD novel-view render.

    Args:
      rgb [3,H,W] in [0,1]; disp [H,W] normalized disparity in [0,1];
      K_norm [3,3] normalized intrinsics; cam_ext [3,4] or [4,4].

    Returns (render [3,H,W], disparity [H,W], mask [H,W]) float64.
    """
    rgb = np.asarray(rgb, np.float64)
    disp = np.asarray(disp, np.float64)
    K_norm = np.asarray(K_norm, np.float64)
    cam_ext = np.asarray(cam_ext, np.float64)
    _, H, W = rgb.shape

    # 1. vertices in the source camera frame
    xs = (np.arange(W) + 0.5) / W
    ys = (np.arange(H) + 0.5) / H
    gx, gy = np.meshgrid(xs, ys)
    pix = np.stack([gx.ravel(), gy.ravel(), np.ones(H * W)], axis=0)
    depth = 1.0 / (disp.ravel() + EPS)
    v_cam = (np.linalg.inv(K_norm) @ pix) * depth[None]

    # 4a. target view; the interpolated depth attribute is the TARGET
    # frame z (render_mesh :41-43 appends vertice_depth after cam_ext)
    R, t = cam_ext[:3, :3], cam_ext[:3, 3]
    v_tgt = R @ v_cam + t[:, None]
    z = v_tgt[2]

    # 3. per-vertex attributes [5, HW]
    vis = sobel_visible_mask(disp)
    attrs = np.concatenate(
        [rgb.reshape(3, -1), vis.reshape(1, -1), z[None]], axis=0)

    # 4b. NDC (get_perspective_from_intrinsic + render_mesh :45-52)
    fx, fy = K_norm[0, 0], K_norm[1, 1]
    cx, cy = K_norm[0, 2], K_norm[1, 2]
    a = (NEAR_Z + FAR_Z) / (FAR_Z - NEAR_Z)
    b = -2.0 * NEAR_Z * FAR_Z / (FAR_Z - NEAR_Z)
    xn = -(2 * fx * v_tgt[0] + (2 * cx - 1) * v_tgt[2]) / v_tgt[2]
    yn = -(2 * fy * v_tgt[1] + (2 * cy - 1) * v_tgt[2]) / v_tgt[2]
    zn = (a * v_tgt[2] + b) / v_tgt[2]
    xn = xn * (W / H)          # the reference hardcodes w/h (:52)

    # 5. rasterize at pixel centers. pytorch3d NDC pixel centers for a
    # non-square image: the SHORT side spans [-1,1], the long side
    # +-long/short; +x left / +y up means column 0 / row 0 sit at the
    # positive end: ndc = (S1 - 2i - 1) / min(H, W).
    s = min(H, W)
    pxs = (W - 2 * np.arange(W) - 1) / s
    pys = (H - 2 * np.arange(H) - 1) / s

    faces = grid_faces(H, W)
    zbuf = np.full((H, W), np.inf)
    out = np.zeros((5, H, W))
    for f in faces:
        x0, x1, x2 = xn[f]
        y0, y1, y2 = yn[f]
        z0, z1, z2 = zn[f]
        d = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        if abs(d) < 1e-12:
            continue
        # candidate pixel bbox (pxs decreases with column index)
        xmin, xmax = min(x0, x1, x2), max(x0, x1, x2)
        ymin, ymax = min(y0, y1, y2), max(y0, y1, y2)
        ix_lo = max(0, int(np.ceil((W - 1 - s * xmax) / 2 - 1e-9)))
        ix_hi = min(W - 1, int(np.floor((W - 1 - s * xmin) / 2 + 1e-9)))
        iy_lo = max(0, int(np.ceil((H - 1 - s * ymax) / 2 - 1e-9)))
        iy_hi = min(H - 1, int(np.floor((H - 1 - s * ymin) / 2 + 1e-9)))
        if ix_lo > ix_hi or iy_lo > iy_hi:
            continue
        px = pxs[ix_lo:ix_hi + 1][None, :]
        py = pys[iy_lo:iy_hi + 1][:, None]
        w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) / d
        w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= -1e-9) & (w1 >= -1e-9) & (w2 >= -1e-9)
        zpix = w0 * z0 + w1 * z1 + w2 * z2
        zwin = zbuf[iy_lo:iy_hi + 1, ix_lo:ix_hi + 1]
        win = inside & (zpix < zwin)
        if not win.any():
            continue
        zbuf[iy_lo:iy_hi + 1, ix_lo:ix_hi + 1] = np.where(win, zpix, zwin)
        av = attrs[:, f]                                   # [5, 3]
        interp = (av[:, 0:1, None] * w0[None]
                  + av[:, 1:2, None] * w1[None]
                  + av[:, 2:3, None] * w2[None])           # [5, bh, bw]
        owin = out[:, iy_lo:iy_hi + 1, ix_lo:ix_hi + 1]
        out[:, iy_lo:iy_hi + 1, ix_lo:ix_hi + 1] = np.where(
            win[None], interp, owin)

    # 6. outputs (render_mesh :64-68)
    mask = out[3]
    render = out[:3] * mask[None]
    disparity = (1.0 / (out[4] + EPS)) * mask
    disparity = np.where(np.isfinite(disparity), disparity, 0.0)
    return render, disparity, mask
