"""Single source of truth for Pallas-vs-XLA kernel dispatch.

Every entry point that can run a Pallas kernel (the generation pipeline,
bench.py, __graft_entry__.py, the RAFT trainer) resolves its execution
strategy HERE instead of re-implementing the supported_shape + backend
probe dance. One resolver prevents the copies drifting (bench.py diverged
once from the entry's fastest-mode choice in round 1) and logs the chosen
path exactly once per configuration.

Resolution order (pinned by tests/test_dispatch.py):
  1. An explicit non-"pallas" request wins unconditionally (user override).
  2. The static shape/tiling guard for the kernel + dtype must hold
     (ops.pallas_warp.supported_shape / ops.pallas_corr.supported_shape).
  3. The one-time backend probe must pass (compile + compare a tiny case
     against the XLA oracle; some remote Mosaic services reject parts of
     Pallas -- ops.pallas_warp.pallas_warp_supported /
     ops.pallas_corr.pallas_corr_supported).
  4. Otherwise fall back to the numerically identical XLA path
     ("preblocked" render / "xla" correlation).

Reference counterparts: the warp kernel accelerates
utils/mpi/homography_sampler.py:149-156; the correlation kernel is the
alt_cuda_corr equivalent (RAFT/alt_cuda_corr/correlation_kernel.cu), which
the reference dispatches with a plain --alternate_corr flag and no
fallback (RAFT/core/raft.py:48-56).
"""
from __future__ import annotations

import logging

log = logging.getLogger("mpiflow_tpu.dispatch")

_logged: set = set()


def _log_once(key, msg: str) -> None:
    if key not in _logged:
        _logged.add(key)
        log.info(msg)


def resolve_render_mode(H: int, W: int, warp_dtype="float32",
                        requested: str = "pallas") -> str:
    """Resolve the MPI render execution strategy for an HxW target.

    warp_dtype is the gather-TABLE dtype (RenderConfig.warp_dtype): the
    bf16 table variant uses a different tiling (ky=16), so the guard and
    probe are both dtype-aware (a backend could accept one and reject the
    other -- ADVICE r2).
    """
    if requested != "pallas":
        return requested
    import jax.numpy as jnp
    from mpiflow_tpu.ops.pallas_warp import (ky_for_dtype,
                                             pallas_warp_supported,
                                             supported_shape)
    dt = jnp.dtype(warp_dtype if warp_dtype is not None else "float32")
    if supported_shape(H, W, ky_for_dtype(dt)) and \
            pallas_warp_supported(dtype=dt):
        _log_once(("render", H, W, dt.name),
                  f"render mode: pallas warp kernel ({dt.name} tables) "
                  f"at {H}x{W}")
        return "pallas"
    _log_once(("render", H, W, dt.name),
              f"render mode: preblocked (pallas warp kernel unavailable "
              f"for {dt.name} tables at {H}x{W} on this backend)")
    return "preblocked"


def resolve_corr_impl(requested: str = "pallas", radius: int = 4,
                      num_pixels=None) -> str:
    """Resolve RAFTConfig.corr_impl for a training/eval run.

    num_pixels (N*h*w at 1/8 res, when known statically) adds the pixel-
    tiling guard up front; raft_forward re-checks per-shape at trace time
    either way. "pallas_interpret" (CPU-mesh tests) passes through: the
    interpreter runs everywhere.
    """
    if requested != "pallas":
        return requested
    from mpiflow_tpu.ops.pallas_corr import (pallas_corr_fused_supported,
                                             pallas_corr_supported,
                                             supported_shape)
    if num_pixels is not None and not supported_shape(num_pixels, radius):
        _log_once(("corr", "shape", num_pixels, radius),
                  f"corr_impl: xla (P={num_pixels}, radius={radius} "
                  f"outside the pallas kernel's tiling)")
        return "xla"
    if pallas_corr_fused_supported(radius):
        # which pallas kernel actually runs is per-shape: raft_forward
        # picks fused only when every level width fits two lane rows
        # (fused_supported_shape), else the matmul kernel
        _log_once(("corr", "fused", radius),
                  f"corr_impl: pallas correlation kernels (radius={radius}; "
                  f"fused where level widths fit, else matmul)")
        return "pallas"
    if pallas_corr_supported(radius):
        _log_once(("corr", "ok", radius),
                  f"corr_impl: pallas correlation kernel (radius={radius})")
        return "pallas"
    _log_once(("corr", "probe", radius),
              "corr_impl: xla (pallas correlation kernel unavailable on "
              "this backend)")
    return "xla"
