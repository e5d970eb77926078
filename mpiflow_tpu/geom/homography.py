"""Per-plane homographies and analytic plane flow for MPI rendering.

Re-derivation of the reference homography warp (utils/mpi/homography_sampler.py)
in a TPU-friendly form:

  * The reference computes H_tgt_src = K_tgt (R - t n^T / -d) K_src^-1 per
    plane and then inverts the 3x3 numerically in fp64 on the *CPU*
    (homography_sampler.py:110-122, with a retry-on-NaN workaround). Since
    n = e3 and the plane matrix is a rank-one update of a rotation, the
    inverse has a closed Sherman-Morrison form:
        A_s = R + (t / d_s) e3^T
        A_s^-1 = R^T - (R^T t / d_s) (R e3)^T / (1 + (R^T t / d_s)_z)
        H_src_tgt = K_src A_s^-1 K_tgt^-1
    so everything stays on-device, fully batched over planes, no fp64.

  * The reference's grid_sample normalization `(x + 0.5) / (0.5 W) - 1` with
    align_corners=False exactly cancels: the sample point is the *raw* source
    pixel coordinate. Downstream sampling therefore gathers directly at the
    coordinates returned here (see mpiflow_tpu.ops.resample).

All functions are single-sample (no batch dim); batch with jax.vmap.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# All coordinate math must run at full fp32: on TPU, plain `@` dispatches to
# the MXU at default (bfloat16-accumulate) precision, which is far too coarse
# for pixel-accurate flow.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def mpi_plane_disparities(num_planes: int, near: float = 1.0, far: float = 0.001,
                          dtype=np.float32) -> np.ndarray:
    """Fixed plane disparities: linspace(near, far, S+2)[1:-1] (model/AdaMPI.py:64-68)."""
    return np.linspace(near, far, num_planes + 2, dtype=np.float64)[1:-1].astype(dtype)


def pixel_grid_homo(height: int, width: int, dtype=np.float32) -> np.ndarray:
    """Homogeneous pixel grid [3,H,W] of (x, y, 1) (homography_sampler.py:46-56)."""
    x = np.arange(width, dtype=dtype)
    y = np.arange(height, dtype=dtype)
    xv, yv = np.meshgrid(x, y)
    return np.stack([xv, yv, np.ones_like(xv)], axis=0)


def plane_homographies(G_tgt_src: jnp.ndarray, K_src: jnp.ndarray,
                       K_tgt: jnp.ndarray, depths: jnp.ndarray):
    """Per-plane homographies for planes z = d_s in the source frame.

    Args:
      G_tgt_src: [4,4] rigid transform source->target.
      K_src, K_tgt: [3,3] pixel intrinsics.
      depths: [S] plane depths (1 / plane disparity).

    Returns:
      (H_tgt_src [S,3,3], H_src_tgt [S,3,3]) mapping src->tgt pixels and back.
    """
    R = G_tgt_src[:3, :3]
    t = G_tgt_src[:3, 3]
    d = depths[:, None, None]  # [S,1,1]

    from mpiflow_tpu.geom.camera import intrinsics_inverse
    K_src_inv = intrinsics_inverse(K_src)
    K_tgt_inv = intrinsics_inverse(K_tgt)

    # A_s = R + (t / d_s) e3^T   (the reference's R - t n^T / -d,
    #  homography_sampler.py:113-116)
    u = t[None, :] / d[:, :, 0]                  # [S,3]
    A = R[None] + u[:, :, None] * jnp.array([0.0, 0.0, 1.0], R.dtype)[None, None, :]
    H_tgt_src = _mm(K_tgt[None], _mm(A, K_src_inv[None]))

    # Sherman-Morrison closed-form inverse of A_s.
    Rt = R.T
    Rtu = _mm(Rt[None], u[:, :, None])[:, :, 0]  # [S,3]
    denom = 1.0 + Rtu[:, 2:3]                    # [S,1]
    # rows: (R e3)^T = third column of R as a row vector
    Re3 = R[:, 2]                                # [3]
    A_inv = Rt[None] - (Rtu[:, :, None] * Re3[None, None, :]) / denom[:, :, None]
    H_src_tgt = _mm(K_src[None], _mm(A_inv, K_tgt_inv[None]))
    return H_tgt_src, H_src_tgt


def homography_grid(H_src_tgt: jnp.ndarray, grid: jnp.ndarray):
    """Map the target pixel grid back into source pixel coordinates.

    Equivalent to homography_sampler.py:125-147 (sample direction).

    Args:
      H_src_tgt: [S,3,3].
      grid: [3,H,W] homogeneous target pixel grid.

    Returns:
      coords   [S,H,W,2] raw source-pixel sample coordinates,
      flow_b2a [S,H,W,2] per-plane tgt->src displacement (coords - grid),
      valid    [S,H,W]   in-bounds mask (-1 < x < W and -1 < y < H).
    """
    _, H, W = grid.shape
    g = grid.reshape(3, -1)                               # [3,N]
    src_homo = _mm(H_src_tgt, g[None])                    # [S,3,N]
    coords = src_homo[:, 0:2] / src_homo[:, 2:3]          # [S,2,N]
    coords = coords.reshape(-1, 2, H, W).transpose(0, 2, 3, 1)  # [S,H,W,2]
    flow_b2a = coords - grid[0:2].transpose(1, 2, 0)[None]
    valid = ((coords[..., 0] < W) & (coords[..., 0] > -1)
             & (coords[..., 1] < H) & (coords[..., 1] > -1))
    return coords, flow_b2a, valid


def plane_flow_a2b(H_tgt_src: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Per-plane source->target flow at source pixels.

    Equivalent to homography_sampler.py:160-220 (sample_inverse): project the
    source grid through H_tgt_src and subtract.

    Returns [S,H,W,2].
    """
    _, H, W = grid.shape
    g = grid.reshape(3, -1)
    tgt_homo = _mm(H_tgt_src, g[None])                    # [S,3,N]
    tgt = tgt_homo[:, 0:2] / tgt_homo[:, 2:3]
    tgt = tgt.reshape(-1, 2, H, W).transpose(0, 2, 3, 1)
    return tgt - grid[0:2].transpose(1, 2, 0)[None]


def src_xyz_from_plane_disparity(grid: jnp.ndarray, disparities: jnp.ndarray,
                                 K_src_inv: jnp.ndarray) -> jnp.ndarray:
    """Per-plane 3D points in the source frame: (K^-1 p) / disp_s.

    Equivalent to mpi_rendering.py:213-239. Returns [S,3,H,W].
    """
    _, H, W = grid.shape
    rays = _mm(K_src_inv, grid.reshape(3, -1))            # [3,N]
    depth = (1.0 / disparities)[:, None, None]            # [S,1,1]
    xyz = rays[None] * depth                              # [S,3,N]
    return xyz.reshape(-1, 3, H, W)


def tgt_xyz_from_plane_disparity(xyz_src: jnp.ndarray,
                                 G_tgt_src: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform of per-plane points (mpi_rendering.py:242-256). [S,3,H,W]."""
    S, _, H, W = xyz_src.shape
    R = G_tgt_src[:3, :3]
    t = G_tgt_src[:3, 3]
    xyz = _mm(R[None], xyz_src.reshape(S, 3, -1)) + t[None, :, None]
    return xyz.reshape(S, 3, H, W)
