import os

import numpy as np
import pytest

from mpiflow_tpu.config import (GenConfig, InpaintConfig, PoseConfig,
                                RenderConfig)
from mpiflow_tpu.io import read_flo
from mpiflow_tpu.io.image import save_image_u8
from mpiflow_tpu.pipeline import DatasetGenerator


def _make_dataset(root, n=2, h=40, w=56):
    rng = np.random.RandomState(0)
    for sub in ("images", "disps", "masks"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        name = f"{i:03d}.png"
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        disp = (np.linspace(0.2, 0.9, h)[:, None]
                * np.ones((h, w)) * 255).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[10:25, 15:35] = 1
        mask[28:36, 40:52] = 2
        save_image_u8(os.path.join(root, "images", name), img)
        save_image_u8(os.path.join(root, "disps", name), disp)
        save_image_u8(os.path.join(root, "masks", name), mask)


def _small_cfg(out, **kw):
    kw.setdefault("inpaint", InpaintConfig(num_iters=32))
    return GenConfig(width=56, height=40, seed=7, repeat=2, out=out,
                     render=RenderConfig(num_planes=8), **kw)


@pytest.mark.parametrize("rng_mode", ["numpy", "jax"])
def test_generator_end_to_end(tmp_path, rng_mode):
    base = str(tmp_path / "base")
    out = str(tmp_path / "out")
    _make_dataset(base)
    gen = DatasetGenerator(_small_cfg(out, rng_mode=rng_mode))
    stats = gen.run(base, out)
    assert stats["images"] == 2
    assert stats["samples"] == 4
    assert stats["errors"] == 0
    flow = read_flo(os.path.join(out, "flows", "000_0.flo"))
    assert flow.shape == (40, 56, 2)
    assert np.isfinite(flow).all()
    assert np.abs(flow).max() > 0.1  # nonzero motion
    assert os.path.exists(os.path.join(out, "src_images", "001_1.png"))
    assert os.path.exists(os.path.join(out, "dst_images", "001_1.png"))


def test_generator_resume_skips(tmp_path):
    base = str(tmp_path / "base")
    out = str(tmp_path / "out")
    _make_dataset(base, n=1)
    cfg = _small_cfg(out)
    gen = DatasetGenerator(cfg)
    s1 = gen.run(base, out)
    assert s1["samples"] == 2
    gen2 = DatasetGenerator(cfg)
    s2 = gen2.run(base, out)
    assert s2["samples"] == 0
    assert s2["skipped"] == 2


def test_generator_rng_parity_same_output(tmp_path):
    """numpy rng mode twice with the same seed => identical datasets."""
    base = str(tmp_path / "base")
    _make_dataset(base, n=1)
    outs = []
    for tag in ("a", "b"):
        out = str(tmp_path / tag)
        DatasetGenerator(_small_cfg(out)).run(base, out)
        outs.append(read_flo(os.path.join(out, "flows", "000_1.flo")))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_generator_data_parallel_matches_single(tmp_path):
    """Mesh-sharded generation (one image/device over the virtual CPU mesh)
    must produce the same dataset as the single-chip path, byte for byte,
    including the ragged final wave."""
    import jax
    ndev = len(jax.devices())
    if ndev < 4:
        pytest.skip("needs >= 4 virtual devices")
    base = str(tmp_path / "base")
    _make_dataset(base, n=5)  # 5 images over 4 devices: one ragged wave
    out_s = str(tmp_path / "single")
    out_p = str(tmp_path / "dp")
    DatasetGenerator(_small_cfg(out_s)).run(base, out_s)
    stats = DatasetGenerator(
        _small_cfg(out_p, mesh_data_axis=4)).run(base, out_p)
    assert stats["images"] == 5
    assert stats["samples"] == 10
    assert stats["errors"] == 0
    for sub in ("flows", "src_images", "dst_images", "obj_mask"):
        d1, d2 = os.path.join(out_s, sub), os.path.join(out_p, sub)
        files = sorted(os.listdir(d1))
        assert files == sorted(os.listdir(d2))
        for f in files:
            a = open(os.path.join(d1, f), "rb").read()
            b = open(os.path.join(d2, f), "rb").read()
            assert a == b, f"{sub}/{f} differs between single and dp paths"


def test_generator_multihost_matches_single(tmp_path):
    """The multi-slice (2 hosts x 4 devices) shape with round-robin input
    sharding must produce the same dataset as the single-chip run, byte for
    byte (jax rng mode is order-independent by design), including ragged
    per-host tails."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    base = str(tmp_path / "base")
    _make_dataset(base, n=5)  # 5 images over 2x4: ragged on both hosts
    out_s = str(tmp_path / "single")
    out_m = str(tmp_path / "mh")
    DatasetGenerator(_small_cfg(out_s, rng_mode="jax")).run(base, out_s)
    stats = DatasetGenerator(
        _small_cfg(out_m, rng_mode="jax", mesh_data_axis=4,
                   mesh_host_axis=2)).run(base, out_m)
    assert stats["images"] == 5
    assert stats["samples"] == 10
    assert stats["errors"] == 0
    for sub in ("flows", "src_images", "dst_images", "obj_mask"):
        d1, d2 = os.path.join(out_s, sub), os.path.join(out_m, sub)
        files = sorted(os.listdir(d1))
        assert files == sorted(os.listdir(d2))
        for f in files:
            a = open(os.path.join(d1, f), "rb").read()
            b = open(os.path.join(d2, f), "rb").read()
            assert a == b, f"{sub}/{f} differs single vs multihost"


def test_generator_multihost_per_host_dirs(tmp_path):
    """One base dir per host row: each host consumes its own input shard
    (the real multi-slice feeding pattern); names must not collide."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    bases = []
    for h in range(2):
        b = str(tmp_path / f"host{h}")
        _make_dataset(b, n=2)
        # per-host unique names: rename 000/001 -> h<h>_000/...
        for sub in ("images", "disps", "masks"):
            d = os.path.join(b, sub)
            for f in sorted(os.listdir(d)):
                os.rename(os.path.join(d, f), os.path.join(d, f"h{h}_{f}"))
        bases.append(b)
    out = str(tmp_path / "out")
    stats = DatasetGenerator(
        _small_cfg(out, rng_mode="jax", mesh_data_axis=2,
                   mesh_host_axis=2)).run(bases, out)
    assert stats["images"] == 4
    assert stats["samples"] == 8
    assert stats["errors"] == 0
    names = sorted(os.listdir(os.path.join(out, "flows")))
    assert [n[:6] for n in names] == ["h0_000"] * 2 + ["h0_001"] * 2 + \
        ["h1_000"] * 2 + ["h1_001"] * 2


def test_generator_multihost_rejects_duplicate_names(tmp_path):
    """Sample keys derive from basenames, so per-host dirs with colliding
    names must fail fast instead of silently overwriting each other."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    bases = []
    for h in range(2):
        b = str(tmp_path / f"host{h}")
        _make_dataset(b, n=1)  # both dirs contain 000.png
        bases.append(b)
    out = str(tmp_path / "out")
    cfg = _small_cfg(out, rng_mode="jax", mesh_data_axis=2,
                     mesh_host_axis=2)
    with pytest.raises(ValueError, match="duplicate image name"):
        DatasetGenerator(cfg).run(bases, out)


def test_generator_multihost_rejects_numpy_rng(tmp_path):
    base = str(tmp_path / "base")
    _make_dataset(base, n=1)
    out = str(tmp_path / "out")
    cfg = _small_cfg(out, mesh_data_axis=2, mesh_host_axis=2)
    with pytest.raises(ValueError, match="rng_mode"):
        DatasetGenerator(cfg).run(base, out)


def test_generator_dp_rejects_oversized_mesh(tmp_path):
    import jax
    base = str(tmp_path / "base")
    _make_dataset(base, n=1)
    out = str(tmp_path / "out")
    cfg = _small_cfg(out, mesh_data_axis=len(jax.devices()) + 1)
    with pytest.raises(ValueError, match="devices"):
        DatasetGenerator(cfg).run(base, out)


def test_generator_cv2_inpaint_mode(tmp_path):
    pytest.importorskip("cv2")
    base = str(tmp_path / "base")
    out = str(tmp_path / "out")
    _make_dataset(base, n=1)
    cfg = _small_cfg(out, inpaint=InpaintConfig(method="cv2_ns"))
    stats = DatasetGenerator(cfg).run(base, out)
    assert stats["samples"] == 2


def test_generator_dp_cv2_inpaint(tmp_path):
    """The sharded drain path must route through the host cv2 inpaint
    exactly like the single-chip path (same files out)."""
    pytest.importorskip("cv2")
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    base = str(tmp_path / "base")
    _make_dataset(base, n=2)
    out_s = str(tmp_path / "single")
    out_p = str(tmp_path / "dp")
    cfg_s = _small_cfg(out_s, inpaint=InpaintConfig(method="cv2_ns"))
    cfg_p = _small_cfg(out_p, inpaint=InpaintConfig(method="cv2_ns"),
                       mesh_data_axis=2)
    DatasetGenerator(cfg_s).run(base, out_s)
    stats = DatasetGenerator(cfg_p).run(base, out_p)
    assert stats["samples"] == 4 and stats["errors"] == 0
    for sub in ("flows", "dst_images"):
        for f in sorted(os.listdir(os.path.join(out_s, sub))):
            a = open(os.path.join(out_s, sub, f), "rb").read()
            b = open(os.path.join(out_p, sub, f), "rb").read()
            assert a == b, f"{sub}/{f}"
