"""The single kernel-dispatch resolver (mpiflow_tpu.utils.dispatch).

Pins the resolution order: explicit override > static shape guard >
backend probe > XLA fallback. bench.py, __graft_entry__.py, the generator
and the trainer all resolve through these two functions (round-2 verdict:
the probe logic was triplicated and had drifted once).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mpiflow_tpu.utils import dispatch
from mpiflow_tpu.ops import pallas_corr, pallas_warp


def test_explicit_override_wins(monkeypatch):
    """A non-pallas request short-circuits: no guard, no probe."""
    def boom(*a, **k):
        raise AssertionError("probe must not run for explicit overrides")
    monkeypatch.setattr(pallas_warp, "pallas_warp_supported", boom)
    monkeypatch.setattr(pallas_corr, "pallas_corr_supported", boom)
    assert dispatch.resolve_render_mode(384, 1280,
                                        requested="preblocked") == "preblocked"
    assert dispatch.resolve_render_mode(384, 1280, requested="scan") == "scan"
    assert dispatch.resolve_corr_impl("xla") == "xla"
    assert dispatch.resolve_corr_impl("pallas_interpret") == "pallas_interpret"


def test_shape_guard_precedes_probe(monkeypatch):
    """An unsupported shape falls back even if the probe would pass."""
    monkeypatch.setattr(pallas_warp, "pallas_warp_supported",
                        lambda *a, **k: True)
    # 100x100 violates the warp kernel tiling (W % 256 != 0)
    assert dispatch.resolve_render_mode(100, 100) == "preblocked"
    monkeypatch.setattr(pallas_corr, "pallas_corr_supported",
                        lambda *a, **k: True)
    # 17 pixels is not divisible by T_PIX
    assert dispatch.resolve_corr_impl("pallas", radius=4,
                                      num_pixels=17) == "xla"
    # radius 8 overflows the WN_PAD window
    assert dispatch.resolve_corr_impl("pallas", radius=8,
                                      num_pixels=128) == "xla"


def test_probe_decides_when_shape_ok(monkeypatch):
    monkeypatch.setattr(pallas_warp, "pallas_warp_supported",
                        lambda *a, **k: True)
    assert dispatch.resolve_render_mode(384, 1280) == "pallas"
    monkeypatch.setattr(pallas_warp, "pallas_warp_supported",
                        lambda *a, **k: False)
    assert dispatch.resolve_render_mode(384, 1280) == "preblocked"
    monkeypatch.setattr(pallas_corr, "pallas_corr_supported",
                        lambda *a, **k: True)
    assert dispatch.resolve_corr_impl("pallas", radius=4,
                                      num_pixels=128) == "pallas"
    monkeypatch.setattr(pallas_corr, "pallas_corr_supported",
                        lambda *a, **k: False)
    assert dispatch.resolve_corr_impl("pallas", radius=4,
                                      num_pixels=128) == "xla"


def test_render_probe_is_dtype_aware(monkeypatch):
    """bf16 tables use a different tiling (ky=16); the guard and probe must
    see the actual table dtype (ADVICE r2: the generator probed only f32
    even when warp_dtype='bfloat16')."""
    seen = {}

    def fake_probe(H=64, W=512, dtype=jnp.float32):
        seen["dtype"] = jnp.dtype(dtype)
        return True

    monkeypatch.setattr(pallas_warp, "pallas_warp_supported", fake_probe)
    assert dispatch.resolve_render_mode(384, 1280, "bfloat16") == "pallas"
    assert seen["dtype"] == jnp.dtype(jnp.bfloat16)
    # 384 % (2*16) == 0 so bf16 tiling holds at KITTI res; a height that
    # only fits the f32 tiling must fall back for bf16 tables
    assert dispatch.resolve_render_mode(48, 1280, "float32") == "pallas"
    assert dispatch.resolve_render_mode(48, 1280, "bfloat16") == "preblocked"


def test_corr_supported_shape_guards():
    assert pallas_corr.supported_shape(128, radius=4)
    assert not pallas_corr.supported_shape(100, radius=4)   # P % T_PIX
    assert pallas_corr.supported_shape(128, radius=7)       # Wn=16 == WN_PAD
    assert not pallas_corr.supported_shape(128, radius=8)   # Wn=18 > WN_PAD


def test_corr_lookup_pallas_rejects_bad_shape():
    """corr_lookup_pallas fail-fasts instead of returning uninitialized
    tail rows (ADVICE r2: silent garbage on non-divisible pixel counts)."""
    corr = jnp.zeros((9, 3, 3, 1), jnp.float32)   # P=9 not divisible by 8
    coords = jnp.zeros((1, 3, 3, 2), jnp.float32)
    with pytest.raises(ValueError, match="supported_shape"):
        pallas_corr.corr_lookup_pallas([corr], coords, radius=4)
    corr = jnp.zeros((16, 4, 4, 1), jnp.float32)
    coords = jnp.zeros((1, 4, 4, 2), jnp.float32)
    with pytest.raises(ValueError, match="supported_shape"):
        pallas_corr.corr_lookup_pallas([corr], coords, radius=8)
