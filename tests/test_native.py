import numpy as np
import pytest

from mpiflow_tpu.io import native
from mpiflow_tpu.io.flo import read_flo, write_flo


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library not buildable in this environment")


def test_native_flo_bitexact(tmp_path, lib_available):
    rng = np.random.RandomState(0)
    flow = rng.randn(13, 17, 2).astype(np.float32) * 30
    p_native = str(tmp_path / "n.flo")
    p_python = str(tmp_path / "p.flo")
    assert native.flo_write_native(p_native, flow)
    write_flo(p_python, flow)
    assert open(p_native, "rb").read() == open(p_python, "rb").read()
    np.testing.assert_array_equal(read_flo(p_native), flow)


def test_native_warp_matches_reference_golden(golden, lib_available):
    """The clean-room C++ z-buffer splat reproduces the reference .so."""
    g = golden("forward_warp")
    out = native.forward_warp_zbuffer_native(g["src"], g["idx"], g["idy"],
                                             g["z"])
    np.testing.assert_array_equal(out, g["warped"])
