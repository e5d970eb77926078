"""Shared CLI runtime helpers."""
from __future__ import annotations

import os


def apply_platform_override() -> None:
    """Honor MPIFLOW_PLATFORM=cpu|axon|tpu before any backend use.

    The environment's sitecustomize forces jax_platforms="axon,cpu",
    overriding the JAX_PLATFORMS env var -- this config update wins over
    it (used to run any CLI host-only for smoke tests / CI)."""
    plat = os.environ.get("MPIFLOW_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
