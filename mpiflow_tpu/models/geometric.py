"""Network-free geometric MPI construction from (image, disparity).

Fallback MPI predictor for when the pretrained AdaMPI checkpoint is not
available (the reference snapshot strips it -- .MISSING_LARGE_BLOBS lists
adampiweight/adampi_64p.pth). Assigns each pixel's density to the planes
bracketing its disparity with a hat-function weight, so the composited
source view reproduces the input image and the composited depth approximates
1/disparity. Useful for self-contained end-to-end generation, benchmarking,
and tests; the learned AdaMPI predictor (mpiflow_tpu.models.adampi) is the
production path when weights are supplied.
"""
from __future__ import annotations

import jax.numpy as jnp


def geometric_mpi(image: jnp.ndarray, disparity: jnp.ndarray,
                  plane_disparities: jnp.ndarray, density: float = 50.0):
    """Build an MPI from an RGBD image.

    Args:
      image: [3,H,W] in [0,1].
      disparity: [H,W] in (0,1].
      plane_disparities: [S] descending (near -> far).
      density: sigma magnitude at full plane assignment.

    Returns (mpi_rgb [S,3,H,W], mpi_sigma [S,1,H,W]).
    """
    S = plane_disparities.shape[0]
    d = plane_disparities[:, None, None]                  # [S,1,1]
    # hat-function assignment over plane disparities (piecewise-linear in
    # disparity; planes are a descending linspace so spacing is uniform)
    spacing = jnp.abs(plane_disparities[0] - plane_disparities[1])
    disp = jnp.clip(disparity, plane_disparities[-1], plane_disparities[0])
    w = jnp.maximum(0.0, 1.0 - jnp.abs(disp[None] - d) / spacing)  # [S,H,W]
    mpi_sigma = (w * density)[:, None]                    # [S,1,H,W]
    mpi_rgb = jnp.broadcast_to(image[None], (S,) + image.shape)
    return mpi_rgb, mpi_sigma
