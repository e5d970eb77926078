import numpy as np
import jax.numpy as jnp

import pytest
from mpiflow_tpu.render import render_novel_view


def test_batched_mode_matches_scan_and_reference(golden):
    g = golden("e2e_dynamic")
    rgb = jnp.asarray(g["mpi_all"][0, :, 0:3])
    sigma = jnp.asarray(g["mpi_all"][0, :, 3:4])
    disp = jnp.asarray(g["disp"])
    K = jnp.asarray(g["K"])
    src = jnp.asarray(g["src_img"][0])
    obj = jnp.asarray(g["obj_mask"][0, 0])

    out_b = render_novel_view(rgb, sigma, disp, jnp.asarray(g["G_obj"]),
                              K, K, src_img=src, obj_mask=obj,
                              mode="batched")
    np.testing.assert_allclose(np.asarray(out_b.frame), g["frame"][0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_b.flow), g["flow"][0],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_b.obj_mask), g["mask"][0, 0],
                               rtol=1e-4, atol=1e-4)

    out_s = render_novel_view(rgb, sigma, disp, jnp.asarray(g["G_obj"]),
                              K, K, src_img=src, obj_mask=obj, mode="scan")
    np.testing.assert_allclose(np.asarray(out_b.frame),
                               np.asarray(out_s.frame), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b.flow),
                               np.asarray(out_s.flow), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_b.depth),
                               np.asarray(out_s.depth), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_b.valid_sum),
                               np.asarray(out_s.valid_sum), atol=1e-4)


def test_batched_hard_flow_matches_scan(golden):
    g = golden("e2e_dynamic")
    rgb = jnp.asarray(g["mpi_all"][0, :, 0:3])
    sigma = jnp.asarray(g["mpi_all"][0, :, 3:4])
    disp = jnp.asarray(g["disp"])
    K = jnp.asarray(g["K"])
    src = jnp.asarray(g["src_img"][0])
    obj = jnp.asarray(g["obj_mask"][0, 0])
    kw = dict(src_img=src, obj_mask=obj, hard_flow=True)
    out_b = render_novel_view(rgb, sigma, disp, jnp.asarray(g["G_obj"]),
                              K, K, mode="batched", **kw)
    out_s = render_novel_view(rgb, sigma, disp, jnp.asarray(g["G_obj"]),
                              K, K, mode="scan", **kw)
    np.testing.assert_allclose(np.asarray(out_b.flow),
                               np.asarray(out_s.flow), atol=1e-5)


def test_preblocked_mode_matches_scan(golden):
    """The shared-precompute renderer must match scan mode exactly,
    including the invert_mask (1-obj) identity."""
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    g = golden("e2e_dynamic")
    args = (jnp.asarray(g["mpi_all"][0, :, 0:3]),
            jnp.asarray(g["mpi_all"][0, :, 3:4]),
            jnp.asarray(g["disp"]),
            jnp.asarray(g["src_img"][0]),
            jnp.asarray(g["obj_mask"][0, 0]),
            jnp.asarray(g["G_obj"]), jnp.asarray(g["G_cam"]),
            jnp.asarray(g["K"]), jnp.asarray(g["K"]))
    a = render_dynamic_sample(*args, mode="scan", inpaint_iters=8)
    b = render_dynamic_sample(*args, mode="preblocked", inpaint_iters=8)
    np.testing.assert_allclose(np.asarray(b.flow), np.asarray(a.flow),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(b.frame_mix_u8),
                                  np.asarray(a.frame_mix_u8))
    np.testing.assert_array_equal(np.asarray(b.holes), np.asarray(a.holes))
    # and against the reference e2e goldens directly
    epe = np.sqrt(((np.asarray(b.flow) - g["flow_mix"]) ** 2).sum(-1))
    assert epe.max() < 0.01


def test_quad_mode_matches_preblocked_bitexact(golden):
    """The one-gather-per-2x2-tile renderer must be BIT-equal to the
    per-pixel preblocked path, both on the golden poses (fast path) and
    under an extreme forward pose that trips the spread guard into the
    per-pixel fallback."""
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    from mpiflow_tpu.render.mpi import preblock_mpi
    g = golden("e2e_dynamic")
    H, W = g["src_img"].shape[-2:]
    assert H % 2 == 0 and W % 2 == 0  # quad path really engages
    args = (jnp.asarray(g["mpi_all"][0, :, 0:3]),
            jnp.asarray(g["mpi_all"][0, :, 3:4]),
            jnp.asarray(g["disp"]),
            jnp.asarray(g["src_img"][0]),
            jnp.asarray(g["obj_mask"][0, 0]),
            jnp.asarray(g["G_obj"]), jnp.asarray(g["G_cam"]),
            jnp.asarray(g["K"]), jnp.asarray(g["K"]))
    a = render_dynamic_sample(*args, mode="preblocked", inpaint_iters=8)
    q = render_dynamic_sample(*args, mode="quad", inpaint_iters=8)
    assert preblock_mpi(args[0], args[1], args[2], args[7],
                        src_img=args[3], obj_mask=args[4], halo=5).halo == 5
    np.testing.assert_array_equal(np.asarray(q.flow), np.asarray(a.flow))
    np.testing.assert_array_equal(np.asarray(q.frame_mix_u8),
                                  np.asarray(a.frame_mix_u8))
    np.testing.assert_array_equal(np.asarray(q.holes), np.asarray(a.holes))
    np.testing.assert_array_equal(np.asarray(q.dst_u8), np.asarray(a.dst_u8))

    # extreme rotation (0.5 rad): local warp stretch exceeds the
    # tile-coherence bound (verified: tile2_spread_ok is False for this
    # pose) -> guarded fallback engages, still bit-equal
    from mpiflow_tpu.geom import transformation_from_parameters
    G_big = transformation_from_parameters(jnp.asarray([0.5, 0.0, 0.0]),
                                           jnp.asarray([0.0, 0.0, 0.0]))
    args_big = args[:5] + (G_big, args[6]) + args[7:]
    ab = render_dynamic_sample(*args_big, mode="preblocked", inpaint_iters=8)
    qb = render_dynamic_sample(*args_big, mode="quad", inpaint_iters=8)
    np.testing.assert_array_equal(np.asarray(qb.flow), np.asarray(ab.flow))
    np.testing.assert_array_equal(np.asarray(qb.frame_mix_u8),
                                  np.asarray(ab.frame_mix_u8))


def test_diffusion_inpaint_close_to_cv2_ns(golden):
    """On-device diffusion fill vs the reference's cv2 NS inpaint: holes
    within a few u8 levels, non-hole pixels bit-equal (PARITY.md)."""
    cv2 = pytest.importorskip("cv2")
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    from mpiflow_tpu.ops.inpaint import inpaint_cv2
    g = golden("e2e_dynamic")
    args = (jnp.asarray(g["mpi_all"][0, :, 0:3]),
            jnp.asarray(g["mpi_all"][0, :, 3:4]),
            jnp.asarray(g["disp"]), jnp.asarray(g["src_img"][0]),
            jnp.asarray(g["obj_mask"][0, 0]),
            jnp.asarray(g["G_obj"]), jnp.asarray(g["G_cam"]),
            jnp.asarray(g["K"]), jnp.asarray(g["K"]))
    out = render_dynamic_sample(*args, inpaint_iters=128)
    holes = np.asarray(out.holes).astype(bool)
    ref = g["inpainted"][:, :, ::-1].astype(np.float32)  # reference (cv2 NS)
    mine = np.asarray(out.dst_u8).astype(np.float32)
    assert (mine == ref)[~holes].all()
    assert np.abs(mine - ref)[holes].mean() < 8.0
