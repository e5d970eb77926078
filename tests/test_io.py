import numpy as np
import pytest

from mpiflow_tpu.io import (
    read_flo, write_flo, read_flow_kitti, write_flow_kitti,
    read_pfm, write_pfm, AsyncSampleWriter, existing_sample_keys,
)


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    flow = rng.randn(17, 23, 2).astype(np.float32) * 50
    p = tmp_path / "a.flo"
    write_flo(str(p), flow)
    back = read_flo(str(p))
    np.testing.assert_array_equal(back, flow)


def test_flo_bytes_match_reference_layout(tmp_path):
    """Byte-exact header + interleaving per write_flow.py:74-103."""
    flow = np.arange(2 * 2 * 2, dtype=np.float32).reshape(2, 2, 2)
    p = tmp_path / "b.flo"
    write_flo(str(p), flow)
    raw = p.read_bytes()
    assert np.frombuffer(raw[:4], "<f4")[0] == np.float32(202021.25)
    assert np.frombuffer(raw[4:12], "<i4").tolist() == [2, 2]  # W, H
    data = np.frombuffer(raw[12:], "<f4")
    # interleaved u,v row-major
    np.testing.assert_array_equal(
        data, np.array([0, 1, 2, 3, 4, 5, 6, 7], np.float32))


def test_flo_separate_uv(tmp_path):
    u = np.ones((4, 5), np.float32)
    v = np.full((4, 5), 2.0, np.float32)
    p = tmp_path / "c.flo"
    write_flo(str(p), u, v)
    back = read_flo(str(p))
    np.testing.assert_array_equal(back[..., 0], u)
    np.testing.assert_array_equal(back[..., 1], v)


def test_kitti_png16_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    # KITTI encoding quantizes to 1/64 px; use representable values
    flow = np.round(rng.randn(8, 9, 2) * 64 * 10) / 64.0
    p = tmp_path / "k.png"
    write_flow_kitti(str(p), flow)
    back, valid = read_flow_kitti(str(p))
    np.testing.assert_allclose(back, flow.astype(np.float32), atol=1e-6)
    assert valid.min() == 1


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    data = rng.rand(6, 7).astype(np.float32)
    p = tmp_path / "d.pfm"
    write_pfm(str(p), data)
    back = read_pfm(str(p))
    np.testing.assert_array_equal(back, data)


def test_async_writer_and_resume(tmp_path):
    out = str(tmp_path / "out")
    flow = np.zeros((4, 6, 2), np.float32)
    img = np.zeros((4, 6, 3), np.uint8)
    with AsyncSampleWriter(out, num_threads=2) as w:
        w.put("img0_0", img, img, flow)
        w.put("img0_1", img, img, flow, mask_u8=img[..., 0])
    assert existing_sample_keys(out) == {"img0_0", "img0_1"}
    got = read_flo(f"{out}/flows/img0_0.flo")
    np.testing.assert_array_equal(got, flow)
