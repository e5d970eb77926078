"""Pallas windowed-correlation kernel vs the XLA row-window lookup
(interpret mode on the CPU mesh; on-TPU equality is probed by
pallas_corr_supported and exercised via RAFTConfig(corr_impl='pallas')).

Reference semantics: CorrBlock.__call__ (RAFT/core/corr.py:29-50) /
alt_cuda_corr (correlation_kernel.cu:7-121).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpiflow_tpu.models.raft import corr_lookup_windowed
from mpiflow_tpu.ops.pallas_corr import corr_lookup_pallas, supported_shape


def _pyramid(rng, P, h, w, levels=3):
    pyr = []
    hl, wl = h, w
    for _ in range(levels):
        pyr.append(jnp.asarray(rng.randn(P, hl, wl, 1).astype(np.float32)))
        hl = max(hl // 2, 1)
        wl = max(wl // 2, 1)
    return pyr


@pytest.mark.parametrize("radius", [3, 4])
def test_forward_matches_xla(radius):
    rng = np.random.RandomState(0)
    N, h, w = 2, 8, 16
    pyr = _pyramid(rng, N * h * w, h, w)
    # coords deliberately run out of bounds on every side
    coords = jnp.asarray(
        (rng.rand(N, h, w, 2) * [w + 8, h + 8] - 4).astype(np.float32))
    ref = corr_lookup_windowed(pyr, coords, radius)
    got = corr_lookup_pallas(pyr, coords, radius, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=0)


def test_backward_matches_xla():
    rng = np.random.RandomState(1)
    N, h, w = 1, 8, 16
    pyr = _pyramid(rng, N * h * w, h, w, levels=2)
    coords = jnp.asarray(
        (rng.rand(N, h, w, 2) * [w - 1, h - 1]).astype(np.float32))
    tang = jnp.asarray(rng.randn(N, h, w, 2 * 81).astype(np.float32))

    def loss(fn, p):
        return jnp.sum(fn(p, coords, 4) * tang)

    g_ref = jax.grad(lambda p: loss(corr_lookup_windowed, p))(pyr)
    g_got = jax.grad(
        lambda p: loss(lambda *a: corr_lookup_pallas(*a, interpret=True),
                       p))(pyr)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


def test_supported_shape_guard():
    assert supported_shape(17280)
    assert not supported_shape(17281)


# -- fused (slice + lane-gather) kernel --------------------------------------


def _fused(pyr, coords, radius, interpret=True):
    from mpiflow_tpu.ops.pallas_corr import corr_lookup_fused
    return corr_lookup_fused(pyr, coords, radius, interpret=interpret)


@pytest.mark.parametrize("radius", [3, 4])
def test_fused_forward_matches_xla(radius):
    rng = np.random.RandomState(0)
    N, h, w = 2, 8, 48                      # coarsest wl=12 >= Wn=10
    pyr = _pyramid(rng, N * h * w, h, w)
    # straddle the maps on both axes (x in [-w,2w], y in [-h,2h])
    coords = jnp.asarray(
        (rng.rand(N, h, w, 2) * [3 * w, 3 * h] - [w, h]).astype(np.float32))
    ref = corr_lookup_windowed(pyr, coords, radius)
    got = _fused(pyr, coords, radius)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=0)


def test_fused_selection_bit_exact_at_integer_coords():
    """With integer coords the bilinear weights are exactly 0/1: any
    difference would be a selection bug, not FMA rounding."""
    rng = np.random.RandomState(3)
    N, h, w = 1, 8, 48
    pyr = _pyramid(rng, N * h * w, h, w, levels=1)
    coords = jnp.asarray(
        np.round(rng.rand(N, h, w, 2) * [3 * w, 3 * h] - [w, h]).astype(
            np.float32))
    ref = corr_lookup_windowed(pyr, coords, 4)
    got = _fused(pyr, coords, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_wide_level_matches_xla():
    """Levels wider than one vreg lane row (the 384x1280 eval class: level-0
    width 160) use the two-half gather; fwd and bwd must match XLA."""
    rng = np.random.RandomState(2)
    N, h, w = 1, 8, 160
    pyr = _pyramid(rng, N * h * w, h, w, levels=2)
    coords = jnp.asarray(
        (rng.rand(N, h, w, 2) * [3 * w, 3 * h] - [w, h]).astype(np.float32))
    ref = corr_lookup_windowed(pyr, coords, 4)
    got = _fused(pyr, coords, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=0)
    tang = jnp.asarray(rng.randn(*np.asarray(ref).shape).astype(np.float32))

    def loss(fn, p):
        return jnp.sum(fn(p, coords, 4) * tang)

    g_ref = jax.grad(lambda p: loss(corr_lookup_windowed, p))(pyr)
    g_got = jax.grad(lambda p: loss(_fused, p))(pyr)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


def test_fused_backward_matches_xla():
    rng = np.random.RandomState(1)
    N, h, w = 1, 8, 48
    pyr = _pyramid(rng, N * h * w, h, w, levels=2)
    coords = jnp.asarray(
        (rng.rand(N, h, w, 2) * [w + 8, h + 8] - 4).astype(np.float32))
    tang = jnp.asarray(rng.randn(N, h, w, 2 * 81).astype(np.float32))

    def loss(fn, p):
        return jnp.sum(fn(p, coords, 4) * tang)

    g_ref = jax.grad(lambda p: loss(corr_lookup_windowed, p))(pyr)
    g_got = jax.grad(lambda p: loss(_fused, p))(pyr)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


def test_fused_shape_guard():
    from mpiflow_tpu.ops.pallas_corr import fused_supported_shape
    good = ((36, 120), (18, 60), (9, 30), (4, 15))
    assert fused_supported_shape(good, 17280, 4)
    assert fused_supported_shape(((48, 160),), 17280, 4)   # wide level OK
    assert not fused_supported_shape(good, 17281, 4)       # tile misfit
    assert not fused_supported_shape(((36, 300),), 17280, 4)  # > 2 lanes
    assert not fused_supported_shape(((36, 8),), 17280, 4)    # wl < window


def test_fused_runs_inside_raft_forward():
    """At a fused-eligible shape (all pyramid widths >= the window), the
    in-model dispatch must pick the fused kernel under pallas_interpret and
    produce the XLA path's flows (ULP-level in interpret mode)."""
    import dataclasses
    from mpiflow_tpu.config import RAFTConfig
    from mpiflow_tpu.models.raft import raft_forward
    from mpiflow_tpu.cli.train_raft import init_random_params

    rng = np.random.RandomState(4)
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(True, 0).items()}
    img1 = jnp.asarray(rng.rand(1, 64, 640, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 64, 640, 3).astype(np.float32) * 255)
    cfg = RAFTConfig.small_config()
    ref = raft_forward(params, img1, img2, cfg, iters=2)
    got = raft_forward(params, img1, img2,
                       dataclasses.replace(cfg,
                                           corr_impl="pallas_interpret"),
                       iters=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_remat_gru_same_values_and_grads():
    """RAFTConfig.remat_gru must not change forward flows or gradients
    (jax.checkpoint is an autodiff-schedule identity)."""
    import dataclasses
    from mpiflow_tpu.config import RAFTConfig
    from mpiflow_tpu.models.raft import raft_forward
    from mpiflow_tpu.cli.train_raft import init_random_params

    rng = np.random.RandomState(5)
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(True, 0).items()}
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    cfg = RAFTConfig.small_config()
    cfg_r = dataclasses.replace(cfg, remat_gru=True)

    def loss(cfg):
        def f(p):
            return jnp.mean(jnp.abs(raft_forward(p, img1, img2, cfg,
                                                 iters=3)))
        return f

    v0, g0 = jax.value_and_grad(loss(cfg))(params)
    v1, g1 = jax.value_and_grad(loss(cfg_r))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    # recompute changes XLA fusion order -> few-ulp differences; tensors
    # whose whole gradient is ~0 are float noise, so tolerance scales with
    # the GLOBAL gradient magnitude
    gscale = max(float(np.abs(np.asarray(v)).max()) for v in g0.values())
    for k in g0:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4 * gscale,
                                   err_msg=k)


def test_raft_forward_dispatch_falls_back():
    """corr_impl='pallas' on the CPU backend must silently fall back to the
    XLA path (probe fails off-TPU) and produce identical flows."""
    import dataclasses
    from mpiflow_tpu.config import RAFTConfig
    from mpiflow_tpu.models.raft import raft_forward
    from mpiflow_tpu.cli.train_raft import init_random_params

    rng = np.random.RandomState(2)
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(True, 0).items()}
    img1 = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    cfg = RAFTConfig.small_config()
    ref = raft_forward(params, img1, img2, cfg, iters=2)
    got = raft_forward(params, img1, img2,
                       dataclasses.replace(cfg, corr_impl="pallas"), iters=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_probes_are_trace_safe():
    """The kernel probes must return the same verdict when first reached at
    TRACE time as when called eagerly. Round-5 regression: inside a jit
    trace the probe's jnp ops staged into the caller's graph, np.asarray
    raised TracerArrayConversionError, the except cached False, and every
    training run whose first probe call happened inside make_train_step's
    trace silently fell back to the XLA lookup (ablate_train measured
    'pallas' == xla at 719 ms while bench_corr, probing eagerly, got the
    kernel at 492 ms on the same shapes)."""
    from mpiflow_tpu.ops import pallas_corr as pc

    for cache in (pc._SUPPORTED, pc._FUSED_SUPPORTED):
        cache.pop((4, True), None)

    verdict = {}

    def traced(x):
        verdict["fused"] = pc.pallas_corr_fused_supported(4, interpret=True)
        verdict["matmul"] = pc.pallas_corr_supported(4, interpret=True)
        return x * 2.0

    jax.jit(traced)(jnp.ones((4, 4)))
    assert verdict["fused"] is True, verdict
    assert verdict["matmul"] is True, verdict

    # eager verdict agrees (cache already warm here, so also re-probe cold)
    for cache in (pc._SUPPORTED, pc._FUSED_SUPPORTED):
        cache.pop((4, True), None)
    assert pc.pallas_corr_fused_supported(4, interpret=True) is True
    assert pc.pallas_corr_supported(4, interpret=True) is True
