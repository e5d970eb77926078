import random

import numpy as np
import jax
import jax.numpy as jnp

from mpiflow_tpu.ops.forward_warp import forward_warp_raster, forward_warp_min
from mpiflow_tpu.depth.bilateral import sparse_bilateral_filter


def test_forward_warp_matches_c_kernel(golden):
    """Bit-exact parity with external/forward_warping/libwarping.so."""
    g = golden("forward_warp")
    out = forward_warp_raster(jnp.asarray(g["src"], jnp.float32),
                              jnp.asarray(g["idx"].astype(np.int32)),
                              jnp.asarray(g["idy"].astype(np.int32)),
                              jnp.asarray(g["z"]))
    ref = g["warped"]  # [h,w,5] = rgb(3), valid, collision
    np.testing.assert_array_equal(
        np.asarray(out.rgb).astype(np.uint8), ref[:, :, 0:3])
    np.testing.assert_array_equal(np.asarray(out.valid), ref[:, :, 3])
    np.testing.assert_array_equal(np.asarray(out.collision), ref[:, :, 4])


def test_forward_warp_min_properties():
    rng = np.random.RandomState(0)
    h, w = 12, 16
    src = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    idx = rng.randint(0, w, (h, w)).astype(np.int32)
    idy = rng.randint(0, h, (h, w)).astype(np.int32)
    z = rng.rand(h, w).astype(np.float32) * 10
    out = forward_warp_min(jnp.asarray(src), jnp.asarray(idx),
                           jnp.asarray(idy), jnp.asarray(z))
    # each valid target holds the src color of its min-z writer
    tgt = idy * w + idx
    for t in np.unique(tgt):
        writers = np.where(tgt.ravel() == t)[0]
        zmin = z.ravel()[writers].min()
        winner = writers[np.argmax(z.ravel()[writers] == zmin)]
        y, x = t // w, t % w
        np.testing.assert_array_equal(np.asarray(out.rgb)[y, x],
                                      src.reshape(-1, 3)[winner])
        assert np.asarray(out.valid)[y, x] == 1
        assert np.asarray(out.collision)[y, x] == (len(writers) == 1)


def test_object_motion_end_to_end():
    from mpiflow_tpu.motion.object_motion import moving_object_with_mask
    from mpiflow_tpu.geom.camera import make_intrinsics
    rng_np = np.random.RandomState(0)
    h, w = 32, 48
    rgb = rng_np.randint(0, 255, (h, w, 3)).astype(np.uint8)
    disp = (0.3 + 0.5 * rng_np.rand(h, w)).astype(np.float32)
    mask = np.zeros((h, w), np.float32)
    mask[8:20, 12:30] = 1
    K = make_intrinsics(w, h)
    rng = random.Random(0)
    out = moving_object_with_mask(rgb, disp, K, mask, rng)
    # background (identity transform) has ~zero flow
    bg_flow = out["flow"][mask == 0]
    assert np.abs(bg_flow).max() < 1e-2
    # object flow is nonzero and consistent with the drawn translation
    obj_flow = out["flow"][mask == 1]
    assert np.abs(obj_flow).mean() > 0.5
    # masks are binary and H' <= H
    assert set(np.unique(out["H"])) <= {0, 1}
    assert (out["H'"] <= out["H"]).all()
    # known pixels of the inpainted image equal the raw warp
    known = out["H"] == 1
    np.testing.assert_array_equal(out["im1"][known], out["im1_raw"][known])


def test_bilateral_filter_matches_reference(golden):
    g = golden("bilateral")
    out = sparse_bilateral_filter(jnp.asarray(g["disp"], jnp.float32),
                                  filter_sizes=(5, 5))
    np.testing.assert_allclose(np.asarray(out), g["out"].astype(np.float32),
                               atol=1e-5)
