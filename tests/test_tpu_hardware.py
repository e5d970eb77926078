"""On-hardware bit-exactness gates at PRODUCTION shapes.

These run only with MPIFLOW_TEST_TPU=1 (tests/conftest.py then leaves jax
on the axon TPU backend). The CPU-mesh suite checks the same kernels in
interpret mode at small shapes; these check the real Mosaic-compiled
kernels at the shapes the product actually uses:

  * warp kernel at KITTI generation res (384x1280)
  * correlation kernel at the RAFT training shape (288x960/8 = 36x120)

Results recorded per round in docs/TPU_EVIDENCE.md.
"""
import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("MPIFLOW_TEST_TPU", "0") != "1",
    reason="set MPIFLOW_TEST_TPU=1 to run on the real TPU backend")


@requires_tpu
def test_warp_kernel_bit_exact_at_kitti_res():
    import jax.numpy as jnp
    from mpiflow_tpu.ops.pallas_warp import bilinear_sample_pallas
    from mpiflow_tpu.ops.resample import bilinear_sample_border

    H, W, C = 384, 1280, 5
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(C, H, W).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    # a realistic plane homography-scale warp (mild shear + translation)
    for sc, rot, tx, ty in ((1.05, 0.015, -6.0, 3.5),
                            (0.92, -0.02, 14.0, -5.0)):
        coords = jnp.asarray(np.stack(
            [xx * sc + rot * yy + tx, yy * (2 - sc) - rot * xx + ty], -1))
        out, ok = bilinear_sample_pallas(img, coords)
        assert bool(ok), "coverage guard must accept production-scale warps"
        ref = bilinear_sample_border(img, coords)
        assert (np.asarray(out) == np.asarray(ref)).all(), \
            "warp kernel must be BIT-exact on hardware"


@requires_tpu
def test_corr_kernel_bit_exact_at_training_shape():
    import jax.numpy as jnp
    from mpiflow_tpu.models.raft import (all_pairs_corr_pyramid,
                                         corr_lookup_windowed)
    from mpiflow_tpu.ops.pallas_corr import corr_lookup_pallas

    N, h, w, D = 1, 36, 120, 64
    rng = np.random.RandomState(1)
    f1 = jnp.asarray(rng.randn(N, h, w, D).astype(np.float32) * 0.1)
    f2 = jnp.asarray(rng.randn(N, h, w, D).astype(np.float32) * 0.1)
    pyr = all_pairs_corr_pyramid(f1, f2, 4)
    coords = jnp.asarray(
        (rng.rand(N, h, w, 2) * [w + 10, h + 10] - 5).astype(np.float32))
    got = corr_lookup_pallas(pyr, coords, radius=4)
    ref = corr_lookup_windowed(pyr, coords, radius=4)
    assert (np.asarray(got) == np.asarray(ref)).all(), \
        "correlation kernel must be BIT-exact on hardware"
