"""Pallas warp kernel: bit-exactness vs the XLA samplers (interpret mode on
CPU), coverage-guard behavior, and the full render mode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpiflow_tpu.ops.pallas_warp import (BAND_H, CHUNK_W, KY, ROW_CANDS,
                                         bilinear_sample_pallas, plan_warp,
                                         supported_shape, table_from_image,
                                         warp_plane_pallas)
from mpiflow_tpu.ops.resample import bilinear_sample_border

H, W, C = 32, 512, 5


def _coords(scale=1.1, rot=0.02, tx=-4.0, ty=2.5):
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    return jnp.asarray(np.stack([xx * scale + rot * yy + tx,
                                 yy * (2.0 - scale) - rot * xx + ty], -1))


def test_supported_shape():
    assert supported_shape(384, 1280)
    assert supported_shape(H, W)
    assert not supported_shape(40, 56)       # too small / misaligned
    assert not supported_shape(384, 1281)


def test_matches_border_sampler():
    """Interpret mode on CPU differs from the XLA sampler by at most 1 ulp
    (XLA CPU contracts the weight FMAs differently inside pallas ops); on
    real TPU hardware the kernel is BIT-exact -- asserted by the
    pallas_warp_supported() probe, which compares with `==` on device.
    A selection/logic bug would show up as O(0.1) errors here."""
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(C, H, W).astype(np.float32))
    for coords in (_coords(), _coords(0.8, -0.03, 30.0, -7.0),
                   _coords(1.0, 0.0, 0.0, 0.0)):
        ref = bilinear_sample_border(img, coords)
        table = table_from_image(img)
        qby, qbx, rb, hx, ok = plan_warp(coords, H, W)
        assert bool(ok)
        out = warp_plane_pallas(table, coords, qby, qbx, rb, hx, C, H, W,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=2e-7)


def test_guard_trips_on_extreme_stretch():
    """A 3x stretch exceeds the tile windows: ok must be False (the render
    falls back to the exact XLA path on that signal). Planned at KITTI
    resolution -- at tiny sizes one window covers the whole table and even
    extreme warps are (correctly) accepted."""
    H2, W2 = 384, 1280
    yy, xx = np.meshgrid(np.arange(H2, dtype=np.float32),
                         np.arange(W2, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([xx * 3.0 - 900.0, yy * 3.0 - 300.0], -1))
    *_, ok = plan_warp(coords, H2, W2)
    assert not bool(ok)
    # and the benign case at the same size passes
    coords2 = jnp.asarray(np.stack([xx * 1.15 - 5.0 + 0.02 * yy,
                                    yy * 0.9 + 3.0], -1))
    *_, ok2 = plan_warp(coords2, H2, W2)
    assert bool(ok2)


def test_guard_trips_on_row_incoherence():
    """Strong shear: per-row source rows span more than ROW_CANDS blocks."""
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([xx, yy + 0.1 * xx], -1))  # dy/dx = 0.1
    *_, ok = plan_warp(coords, H, W)
    # 0.1 * 512px = 51px span per row >> ROW_CANDS*2
    assert not bool(ok)


def test_render_mode_pallas_matches_preblocked(golden):
    """Full dynamic render in mode='pallas' (interpret on CPU) must equal
    mode='preblocked' bit for bit at a kernel-supported resolution."""
    from mpiflow_tpu.geom.camera import make_intrinsics
    from mpiflow_tpu.geom.homography import mpi_plane_disparities
    from mpiflow_tpu.models.geometric import geometric_mpi
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    from mpiflow_tpu.geom import transformation_from_parameters

    rng = np.random.RandomState(0)
    S = 6
    K = jnp.asarray(make_intrinsics(W, H))
    disparities = jnp.asarray(mpi_plane_disparities(S))
    img = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    disp = jnp.asarray((0.2 + 0.6 * rng.rand(H, W)).astype(np.float32))
    mask = jnp.zeros((H, W)).at[8:20, 100:300].set(1.0)
    mpi_rgb, mpi_sigma = geometric_mpi(img, disp, disparities)
    G_obj = transformation_from_parameters(
        jnp.asarray([0.01, -0.005, 0.002]), jnp.asarray([0.03, 0.02, -0.04]))
    G_cam = transformation_from_parameters(
        jnp.asarray([-0.008, 0.006, -0.003]), jnp.asarray([0.06, -0.05, -0.1]))
    args = (mpi_rgb, mpi_sigma, disparities, img, mask, G_obj, G_cam, K, K)
    a = render_dynamic_sample(*args, mode="preblocked", inpaint_iters=8)
    p = render_dynamic_sample(*args, mode="pallas", inpaint_iters=8)
    # flow is analytic (never gathered): exact even in interpret mode
    np.testing.assert_array_equal(np.asarray(p.flow), np.asarray(a.flow))
    # gathered channels: 1-ulp interpret-mode tolerance (bit-exact on TPU,
    # see test_matches_border_sampler)
    assert (np.abs(np.asarray(p.frame_mix_u8).astype(np.int16)
                   - np.asarray(a.frame_mix_u8).astype(np.int16)) <= 1).all()
    np.testing.assert_array_equal(np.asarray(p.holes), np.asarray(a.holes))

    # guard-tripping pose (0.5 rad): fallback engages -> the exact XLA
    # sampler runs, so everything is bit-equal even on CPU
    G_big = transformation_from_parameters(
        jnp.asarray([0.5, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 0.0]))
    args_big = args[:5] + (G_big,) + args[6:]
    ab = render_dynamic_sample(*args_big, mode="preblocked", inpaint_iters=8)
    pb = render_dynamic_sample(*args_big, mode="pallas", inpaint_iters=8)
    np.testing.assert_array_equal(np.asarray(pb.flow), np.asarray(ab.flow))
    np.testing.assert_array_equal(np.asarray(pb.frame_mix_u8),
                                  np.asarray(ab.frame_mix_u8))


def test_render_mode_pallas_downgrades_on_small_shapes(golden):
    """At non-tileable resolutions mode='pallas' must silently use the
    preblocked layout (no crash, same numbers)."""
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    g = golden("e2e_dynamic")
    args = (jnp.asarray(g["mpi_all"][0, :, 0:3]),
            jnp.asarray(g["mpi_all"][0, :, 3:4]),
            jnp.asarray(g["disp"]),
            jnp.asarray(g["src_img"][0]),
            jnp.asarray(g["obj_mask"][0, 0]),
            jnp.asarray(g["G_obj"]), jnp.asarray(g["G_cam"]),
            jnp.asarray(g["K"]), jnp.asarray(g["K"]))
    a = render_dynamic_sample(*args, mode="preblocked", inpaint_iters=8)
    p = render_dynamic_sample(*args, mode="pallas", inpaint_iters=8)
    np.testing.assert_array_equal(np.asarray(p.flow), np.asarray(a.flow))
    np.testing.assert_array_equal(np.asarray(p.dst_u8), np.asarray(a.dst_u8))


def test_row_candidate_tiers_dispatch():
    """The render lax.cond's between rc=2 / rc=4 / XLA-fallback kernels.
    A shear warp with ~3 block rows of within-row spread must fail the
    rc=2 guard, pass rc=4, and still match the XLA path exactly."""
    H2, W2 = 64, 512
    yy, xx = np.meshgrid(np.arange(H2, dtype=np.float32),
                         np.arange(W2, dtype=np.float32), indexing="ij")
    # dy/dx = 0.045 -> ~5.8 px of y-variation across a 128-px chunk row
    coords = jnp.asarray(np.stack([xx, yy + 0.045 * xx - 10.0], -1))
    *_, ok2 = plan_warp(coords, H2, W2, row_cands=2)
    *_, ok4 = plan_warp(coords, H2, W2, row_cands=4)
    assert not bool(ok2) and bool(ok4)

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(C, H2, W2).astype(np.float32))
    ref = bilinear_sample_border(img, coords)
    out, ok = bilinear_sample_pallas(img, coords, interpret=True)
    # the wrapper runs rc=4 planning; guard must accept and match exactly
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-7)
