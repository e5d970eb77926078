"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is first imported anywhere in the test process.
"""
import os

if os.environ.get("MPIFLOW_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden" / "data"

import numpy as np
import pytest

# persistent compile cache: repeated test runs skip recompilation.
# NOTE: keyed per-backend -- the axon TPU plugin's remote-compile service
# writes CPU AOT blobs for a DIFFERENT host CPU into the cache, which load
# with mismatched machine features and corrupt numerics (observed as golden
# test failures). Never share a cache dir with the axon backend.
import hashlib
import jax

# ... and keyed per-HOST: XLA:CPU caches AOT code with the build machine's
# feature set, and a cache dir carried across different hosts (e.g. between
# driver rounds) loads blobs whose machine features mismatch -- XLA warns
# "could lead to execution errors such as SIGILL" and numerics can corrupt
# silently. Fingerprint the CPU flags into the dir name.
try:
    with open("/proc/cpuinfo") as f:
        _flags = next((ln for ln in f if ln.startswith("flags")), "")
except OSError:
    _flags = ""
_host = hashlib.sha1(_flags.encode()).hexdigest()[:8]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/mpiflow_jax_cache_cputest_{_host}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu", overriding the JAX_PLATFORMS env var -- pin the
# config itself so tests really run on the virtual 8-device CPU mesh.
if os.environ.get("MPIFLOW_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def golden():
    """Load a golden .npz produced by tests/golden/gen_goldens.py."""
    def _load(name):
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden fixture {name} not generated "
                        f"(run tests/golden/gen_goldens.py)")
        return dict(np.load(path, allow_pickle=False))
    return _load
