import os
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_canny_detects_step_edge():
    from mpiflow_tpu.ops.canny import canny_edges
    img = np.zeros((40, 60), np.float32)
    img[:, 30:] = 1.0
    edges = np.asarray(canny_edges(jnp.asarray(img), sigma=2.0))
    cols = np.where(edges.any(axis=0))[0]
    assert len(cols) > 0
    assert abs(cols.mean() - 29.5) < 3  # edge localized at the step
    # no edges in flat regions
    assert edges[:, :20].sum() == 0
    assert edges[:, 40:].sum() == 0


def test_canny_respects_mask():
    from mpiflow_tpu.ops.canny import canny_edges
    img = np.zeros((40, 60), np.float32)
    img[:, 30:] = 1.0
    mask = np.zeros((40, 60), np.float32)
    mask[:20] = 1.0
    edges = np.asarray(canny_edges(jnp.asarray(img), mask=jnp.asarray(mask)))
    assert edges[:18].sum() > 0
    assert edges[22:].sum() == 0


def test_perspective_flow_and_backwarp():
    from mpiflow_tpu.ops.perspective import (
        random_perspective_matrix, perspective_flow, backwarp)
    key = jax.random.PRNGKey(0)
    H, W = 32, 48
    M = random_perspective_matrix(key, H, W, shift=0.05)
    flow = perspective_flow(M, H, W)
    assert flow.shape == (H, W, 2)
    assert np.isfinite(np.asarray(flow)).all()
    # identity homography -> zero flow
    flow0 = perspective_flow(jnp.eye(3), H, W)
    np.testing.assert_allclose(np.asarray(flow0), 0.0, atol=1e-4)
    # backwarp with zero flow is identity
    img = jnp.asarray(np.random.RandomState(0).rand(3, H, W), jnp.float32)
    out = backwarp(img, jnp.zeros((H, W, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_flow_color_matches_reference_colorwheel(golden):
    """Colorization parity against the reference implementation run inline
    (flow_colors.py is pure numpy -- compare against our port's output
    invariants instead: center flow is white-ish, colors vary with angle)."""
    from mpiflow_tpu.viz.flow_viz import flow_to_color, flow_to_color_jax
    rng = np.random.RandomState(0)
    flow = rng.randn(16, 20, 2).astype(np.float32) * 5
    a = flow_to_color(flow)
    b = np.asarray(flow_to_color_jax(jnp.asarray(flow)))
    # numpy and jit versions agree
    assert (np.abs(a.astype(int) - b.astype(int)) <= 1).mean() > 0.99
    # zero flow -> white
    white = flow_to_color(np.zeros((4, 4, 2), np.float32))
    assert (white > 250).all()


def test_in_memory_flow_pairs_ring():
    from mpiflow_tpu.data.datasets import InMemoryFlowPairs
    buf = InMemoryFlowPairs(capacity=3)
    for i in range(5):
        img = np.full((8, 10, 3), i, np.uint8)
        buf.add(img, img, np.zeros((8, 10, 2), np.float32))
    assert len(buf) == 3
    vals = {int(buf[i][0][0, 0, 0]) for i in range(3)}
    assert vals == {2, 3, 4}  # oldest evicted


def test_epe_f1_metric():
    from mpiflow_tpu.train.evaluate import epe_f1
    gt = np.zeros((8, 10, 2), np.float32)
    gt[..., 0] = 10.0
    pred = gt.copy()
    pred[0, 0] += 5.0  # one big outlier (epe ~7 > 3, ratio 0.7 > 0.05)
    epe, f1, _ = epe_f1(pred, gt)
    assert f1 == pytest.approx(100 / 80, rel=1e-3)
    assert epe == pytest.approx(np.sqrt(2 * 25) / 80, rel=1e-3)


def test_object_translation_stream():
    from mpiflow_tpu.motion.object_motion import sample_object_translation
    rng = random.Random(3)
    t1 = sample_object_translation(rng)
    rng2 = random.Random(3)
    t2 = sample_object_translation(rng2)
    np.testing.assert_array_equal(t1, t2)
    assert 0.05 <= t1[0] <= 0.1 and -0.1 <= t1[1] <= -0.05


def test_convert_ckpt_cli_roundtrip(tmp_path):
    import torch
    from mpiflow_tpu.cli.convert_ckpt import main as convert_main
    sd = {"module.layer.weight": torch.randn(4, 3, 3, 3),
          "module.layer.bias": torch.randn(4)}
    src = str(tmp_path / "m.pth")
    dst = str(tmp_path / "m.npz")
    torch.save({"num_planes": 32, "weight": sd}, src)
    convert_main([src, dst])
    from mpiflow_tpu.models.torch_convert import load_torch_checkpoint
    back = load_torch_checkpoint(dst)
    assert back["num_planes"] == 32
    assert back["weight"]["layer.weight"].shape == (3, 3, 3, 4)  # HWIO


def test_disparity_samplers():
    from mpiflow_tpu.geom.sampling import (
        sample_disparity_from_bins, sample_disparity_linspace, sample_pdf)
    key = jax.random.PRNGKey(0)
    edges = jnp.linspace(1.0, 0.001, 9)
    d = sample_disparity_from_bins(key, 4, edges)
    assert d.shape == (4, 8)
    d = np.asarray(d)
    assert (d <= np.asarray(edges)[:-1][None] + 1e-6).all()
    assert (d >= np.asarray(edges)[1:][None] - 1e-6).all()

    d2 = np.asarray(sample_disparity_linspace(key, 3, 8, 1.0, 0.001))
    assert d2.shape == (3, 8)
    assert (d2 <= 1.0).all() and (d2 >= 0.0).all()

    # pdf sampling concentrates where weights are high
    vals = jnp.linspace(0, 1, 16)[None, None, None].repeat(2, 2)
    w = jnp.zeros((1, 1, 2, 16)).at[..., 12].set(1.0)
    s = np.asarray(sample_pdf(key, vals, w, 64))
    assert s.shape == (1, 1, 2, 64)
    assert abs(s.mean() - float(vals[0, 0, 0, 12])) < 0.1


def test_disparity_consistency_zero_for_consistent_maps():
    from mpiflow_tpu.geom.sampling import disparity_consistency
    from mpiflow_tpu.geom import pixel_grid_homo, intrinsics_inverse, make_intrinsics
    H, W = 24, 32
    K = make_intrinsics(W, H)
    grid = jnp.asarray(pixel_grid_homo(H, W))
    disp = jnp.full((H, W), 0.5)
    loss = disparity_consistency(grid, intrinsics_inverse(K), disp,
                                 jnp.eye(4), jnp.asarray(K), disp)
    assert float(loss) < 1e-5
