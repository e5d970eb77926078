import os

import numpy as np
import jax.numpy as jnp
import pytest

from mpiflow_tpu.io.flo import write_flo, write_flow_kitti
from mpiflow_tpu.io.image import save_image_u8


def _mini_kitti(root, n=2, h=40, w=64):
    """KITTI-2015 layout: image_2/*_10.png,_11.png + flow_occ/*_10.png."""
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "training", "image_2"), exist_ok=True)
    os.makedirs(os.path.join(root, "training", "flow_occ"), exist_ok=True)
    for i in range(n):
        img1 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        img2 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        save_image_u8(os.path.join(root, "training", "image_2",
                                   f"{i:06d}_10.png"), img1)
        save_image_u8(os.path.join(root, "training", "image_2",
                                   f"{i:06d}_11.png"), img2)
        flow = np.round(rng.randn(h, w, 2) * 64) / 64.0
        write_flow_kitti(os.path.join(root, "training", "flow_occ",
                                      f"{i:06d}_10.png"), flow)
    return root


def test_kitti_reader(tmp_path):
    from mpiflow_tpu.data.datasets import KITTIPairs
    root = _mini_kitti(str(tmp_path))
    ds = KITTIPairs(root, "training", aug_params=None)
    assert len(ds) == 2
    img1, img2, flow, valid = ds[0]
    assert img1.shape == (40, 64, 3) and flow.shape == (40, 64, 2)
    assert valid.min() >= 0 and valid.max() <= 1


def test_validate_kitti_on_known_flow(tmp_path):
    """A 'model' that returns the GT flow must score EPE=0, F1=0."""
    from mpiflow_tpu.train import evaluate as ev
    root = _mini_kitti(str(tmp_path), h=64, w=96)

    gts = {}
    from mpiflow_tpu.data.datasets import KITTIPairs
    ds = KITTIPairs(root, "training", aug_params=None)
    for i in range(len(ds)):
        gts[i] = ds[i][2]

    calls = {"i": -1}

    def fake_infer(img1, img2):
        calls["i"] += 1
        return jnp.asarray(gts[calls["i"]][None])

    orig = ev._make_infer
    ev._make_infer = lambda *a, **k: fake_infer
    try:
        res = ev.validate_kitti({}, root, log_fn=lambda *_: None)
    finally:
        ev._make_infer = orig
    assert res["kitti-epe"] == pytest.approx(0.0, abs=1e-4)
    assert res["kitti-f1"] == 0.0


def test_mpiflow_mix_reader(tmp_path):
    from mpiflow_tpu.data.datasets import MPIFlowMix
    rng = np.random.RandomState(0)
    roots = []
    for name, layout in (("a", ("image_1", "image_2", "flo")),
                         ("b", ("src_images", "dst_images", "flows"))):
        root = str(tmp_path / name)
        for sub in layout:
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        img = (rng.rand(8, 10, 3) * 255).astype(np.uint8)
        save_image_u8(os.path.join(root, layout[0], "x.png"), img)
        save_image_u8(os.path.join(root, layout[1], "x.png"), img)
        write_flo(os.path.join(root, layout[2], "x.flo"),
                  np.zeros((8, 10, 2), np.float32))
        roots.append(root)
    ds = MPIFlowMix(roots)
    assert len(ds) == 2
    i1, i2, f, v = ds[0]
    assert f.shape == (8, 10, 2)


def test_input_padder_matches_torch():
    import torch
    import torch.nn.functional as F
    from mpiflow_tpu.train.evaluate import pad_to_multiple_of_8
    rng = np.random.RandomState(0)
    for h, w, mode in ((37, 50, "sintel"), (41, 64, "kitti"), (40, 48, "sintel")):
        img = rng.rand(h, w, 3).astype(np.float32)
        out, crop = pad_to_multiple_of_8(img, mode)
        assert out.shape[0] % 8 == 0 and out.shape[1] % 8 == 0
        # reference InputPadder (RAFT/core/utils/utils.py:7-24)
        pad_ht = (((h // 8) + 1) * 8 - h) % 8
        pad_wd = (((w // 8) + 1) * 8 - w) % 8
        if mode == "sintel":
            pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                   pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]
        t = torch.from_numpy(img.transpose(2, 0, 1))[None]
        ref = F.pad(t, pad, mode="replicate")[0].numpy().transpose(1, 2, 0)
        np.testing.assert_array_equal(out, ref)
        # unpad recovers the original
        np.testing.assert_array_equal(out[crop[0], crop[1]], img)


def test_kitti_submission_writer(tmp_path):
    from mpiflow_tpu.train import evaluate as ev
    from mpiflow_tpu.io.flo import read_flow_kitti
    root = str(tmp_path / "kitti")
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "testing", "image_2"), exist_ok=True)
    for i in range(1):
        for suf in ("_10", "_11"):
            save_image_u8(os.path.join(root, "testing", "image_2",
                                       f"{i:06d}{suf}.png"),
                          (rng.rand(64, 96, 3) * 255).astype(np.uint8))

    def fake_infer(img1, img2):
        return jnp.ones((1, img1.shape[1], img1.shape[2], 2)) * 2.5

    orig = ev._make_infer
    ev._make_infer = lambda *a, **k: fake_infer
    try:
        out_dir = str(tmp_path / "sub")
        ev.create_kitti_submission({}, root, out_dir)
    finally:
        ev._make_infer = orig
    flow, valid = read_flow_kitti(os.path.join(out_dir, "000000_10.png"))
    np.testing.assert_allclose(flow, 2.5, atol=1e-6)


def test_fetch_dataset_things_and_sintel_mixture(tmp_path):
    """Stage map parity with the reference's fetch_dataloader
    (RAFT/core/datasets.py:213-252): 'things' = clean+final passes;
    'sintel' = 100x clean + 100x final (+ weighted KITTI/HD1K/Things when
    present under data_root)."""
    import numpy as np
    from mpiflow_tpu.data.datasets import fetch_dataset
    from mpiflow_tpu.io.image import save_image_u8
    from mpiflow_tpu.io.flo import write_flo

    # fake Sintel: 1 scene, 3 frames -> 2 pairs per pass
    sroot = tmp_path / "Sintel" / "training"
    for dstype in ("clean", "final"):
        d = sroot / dstype / "alley_1"
        d.mkdir(parents=True)
        for i in range(3):
            save_image_u8(str(d / f"frame_{i:04d}.png"),
                          np.zeros((16, 16, 3), np.uint8))
    f = sroot / "flow" / "alley_1"
    f.mkdir(parents=True)
    for i in range(2):
        write_flo(str(f / f"frame_{i:04d}.flo"), np.zeros((16, 16, 2),
                                                          np.float32))
    ds = fetch_dataset("sintel", str(tmp_path), (8, 8))
    assert len(ds) == 100 * 2 + 100 * 2

    # fake FlyingThings: minimal TRAIN tree with 2 frames -> 1 pair/pass
    troot = tmp_path / "things"
    for dstype in ("frames_cleanpass", "frames_finalpass"):
        d = troot / dstype / "TRAIN" / "A" / "0000" / "left"
        d.mkdir(parents=True)
        for i in range(2):
            save_image_u8(str(d / f"{i:04d}.png"),
                          np.zeros((16, 16, 3), np.uint8))
    fd = troot / "optical_flow" / "TRAIN" / "A" / "0000"
    for direction in ("into_future", "into_past"):
        (fd / direction / "left").mkdir(parents=True)
    # PFM flows
    import struct
    for direction in ("into_future", "into_past"):
        for i in range(2):
            p = fd / direction / "left" / f"{i:04d}.pfm"
            flo = np.zeros((16, 16, 3), np.float32)
            with open(p, "wb") as fh:
                fh.write(b"PF\n16 16\n-1.0\n")
                fh.write(flo.tobytes())
    ds_t = fetch_dataset("things", str(troot), (8, 8))
    # 1 pair per (pass, direction): clean/final x into_future/into_past
    assert len(ds_t) == 4
