"""Shared CLI runtime helpers."""
from __future__ import annotations

import hashlib
import os


def compile_cache_dir(backend: str) -> str:
    """Persistent-compile-cache dir keyed by backend AND host fingerprint.

    Two hazards force the double key (both observed on this environment,
    tests/conftest.py): the axon remote-compile service writes CPU AOT
    blobs for a DIFFERENT host CPU into whatever cache dir it is given,
    and a cache dir carried across hosts (driver rounds land on different
    machines) loads XLA:CPU AOT code with mismatched machine features --
    silent numeric corruption or SIGILL."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    # jaxlib version in the key too: an AOT blob written by a different
    # XLA/LLVM build can carry target features (+prefer-no-gather, ...)
    # the loader rejects even when /proc/cpuinfo flags match (seen r4)
    try:
        import jaxlib
        ver = getattr(jaxlib, "__version__", "")
    except Exception:  # pragma: no cover
        ver = ""
    host = hashlib.sha1(f"{flags}|{ver}".encode()).hexdigest()[:8]
    return f"/tmp/mpiflow_jax_cache_{backend}_{host}"


def enable_compile_cache() -> None:
    """Point jax at the per-backend, per-host persistent compile cache."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      compile_cache_dir(jax.default_backend()))


def apply_platform_override() -> None:
    """Honor MPIFLOW_PLATFORM=cpu|axon|tpu before any backend use.

    The environment's sitecustomize forces jax_platforms="axon,cpu",
    overriding the JAX_PLATFORMS env var -- this config update wins over
    it (used to run any CLI host-only for smoke tests / CI)."""
    plat = os.environ.get("MPIFLOW_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
