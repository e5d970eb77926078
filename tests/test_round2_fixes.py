"""Round-2 correctness fixes: hue-jitter magnitude, intrinsics scaling,
chairs split, BN train mode, warm-start low-res flow, fail-fast predictor,
bilateral preprocessing flag, flow_viz side outputs."""
import os

import numpy as np
import pytest
import jax.numpy as jnp


# ---------------------------------------------------------------- hue jitter
def test_hue_jitter_magnitude_matches_torchvision():
    """ColorJitter(hue=h) draws a shift in +/-h TURNS of the hue wheel
    (RAFT/core/utils/augmentor.py:32 uses hue=0.5/3.14). _hue_shift takes a
    wheel fraction, so the configured hue must be 0.5/3.14, not divided by
    another 2*pi."""
    from mpiflow_tpu.data.augmentor import FlowAugmentor, SparseFlowAugmentor
    a = FlowAugmentor((32, 32))
    assert a.jitter["hue"] == pytest.approx(0.5 / 3.14)
    s = SparseFlowAugmentor((32, 32))
    assert s.jitter["hue"] == pytest.approx(0.3 / 3.14)


def test_hue_shift_semantics_match_hsv_roundtrip():
    """_hue_shift(x, f) must equal the canonical HSV round-trip with H
    shifted by f turns -- exactly what torchvision adjust_hue(img, f) does
    (torchvision isn't shipped here; colorsys implements the same math)."""
    import colorsys
    from mpiflow_tpu.data.augmentor import _hue_shift

    rng = np.random.RandomState(0)
    img = (rng.rand(8, 9, 3) * 255).astype(np.uint8)
    for shift in (-0.159, -0.05, 0.0, 0.08, 0.159):
        ours = np.clip(_hue_shift(img.astype(np.float32), shift), 0, 255)
        want = np.empty_like(ours)
        for i in range(img.shape[0]):
            for j in range(img.shape[1]):
                h, s, v = colorsys.rgb_to_hsv(*(img[i, j] / 255.0))
                r, g, b = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
                want[i, j] = np.array([r, g, b]) * 255.0
        assert np.abs(ours - want).max() <= 1e-2, shift


def test_hue_jitter_actually_moves_hue():
    """A pure-red image jittered with hue-only must visit strongly non-red
    hues (the old /2pi bug kept shifts within +/-0.025 turns => always red)."""
    from mpiflow_tpu.data.augmentor import _color_jitter
    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 200
    rng = np.random.RandomState(1)
    max_green = 0
    for _ in range(200):
        out = _color_jitter(rng, img, brightness=0, contrast=0, saturation=0,
                            hue=0.5 / 3.14)
        max_green = max(max_green, int(out[..., 1].max()))
    # shifts up to 0.159 turns push red well into green territory
    assert max_green > 100, max_green


# ----------------------------------------------------------------- camera K
def test_scale_intrinsics_anisotropic():
    from mpiflow_tpu.geom.camera import scale_intrinsics
    K = np.array([[700.0, 0.0, 320.0],
                  [0.0, 650.0, 240.0],
                  [0.0, 0.0, 1.0]], np.float32)
    sx, sy = 0.5, 0.25
    got = np.asarray(scale_intrinsics(K, sx, sy))
    want = np.diag([sx, sy, 1.0]).astype(np.float32) @ K
    np.testing.assert_allclose(got, want, rtol=1e-6)


# -------------------------------------------------------------- chairs split
def test_chairs_split_bundled():
    from mpiflow_tpu.data.datasets import load_chairs_split
    s = load_chairs_split()
    assert s.shape == (22872,)
    assert set(np.unique(s)) == {1, 2}
    assert int((s == 2).sum()) == 640  # official validation count


def test_chairs_split_matches_reference_file():
    ref = "/root/reference/RAFT/chairs_split.txt"
    if not os.path.exists(ref):
        pytest.skip("reference snapshot not mounted")
    from mpiflow_tpu.data.datasets import load_chairs_split
    np.testing.assert_array_equal(load_chairs_split(),
                                  np.loadtxt(ref, dtype=np.int32))


def test_chairs_split_missing_override_errors():
    from mpiflow_tpu.data.datasets import load_chairs_split
    with pytest.raises(FileNotFoundError):
        load_chairs_split("/nonexistent/split.txt")


# ------------------------------------------------------------- BN train mode
def _tiny_big_raft_params(seed=0):
    from mpiflow_tpu.cli.train_raft import init_random_params
    return {k: jnp.asarray(v)
            for k, v in init_random_params(small=False, seed=seed).items()}


def test_raft_bn_train_updates_running_stats():
    from mpiflow_tpu.models.raft import raft_forward
    from mpiflow_tpu.config import RAFTConfig
    params = _tiny_big_raft_params()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32) * 255)
    preds, stats = raft_forward(params, img, img, RAFTConfig(), iters=2,
                                bn_train=True)
    assert preds.shape[0] == 2
    assert stats, "no BN stats collected"
    for k, v in stats.items():
        assert k.startswith("cnet.") and ("running_mean" in k
                                          or "running_var" in k)
        assert v.shape == params[k].shape
    # momentum update must move the buffers off their init values
    moved = sum(float(jnp.abs(stats[k] - params[k]).max()) for k in stats)
    assert moved > 0
    # torch semantics: new_mean = 0.9*old + 0.1*batch; with old=0 the update
    # magnitude is bounded by 0.1*|batch stat|
    k0 = next(k for k in stats if k.endswith("running_mean"))
    assert float(jnp.abs(stats[k0]).max()) < 50.0


def test_train_step_bn_modes():
    """freeze_bn=True leaves running stats bit-identical (buffers are masked
    out of the optimizer); freeze_bn=False momentum-updates them."""
    from mpiflow_tpu.config import RAFTConfig, TrainConfig
    from mpiflow_tpu.train.raft_train import make_optimizer, make_train_step
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32) * 255)
    flow = jnp.asarray(rng.randn(2, 64, 96, 2).astype(np.float32))
    valid = jnp.ones((2, 64, 96), jnp.float32)
    model_cfg = RAFTConfig()

    for freeze in (True, False):
        cfg = TrainConfig(lr=1e-4, num_steps=10, iters=2, batch_size=2,
                          image_size=(64, 96), freeze_bn=freeze)
        params = _tiny_big_raft_params()
        buf_keys = [k for k in params if k.endswith("running_mean")
                    or k.endswith("running_var")]
        before = {k: np.asarray(params[k]) for k in buf_keys}
        tx, _ = make_optimizer(cfg)
        step = make_train_step(cfg, model_cfg, tx, donate=False)
        opt_state = tx.init(params)
        params2, _, metrics = step(params, opt_state, img1, img2, flow, valid)
        assert np.isfinite(float(metrics["loss"]))
        changed = sum(
            float(np.abs(np.asarray(params2[k]) - before[k]).max())
            for k in buf_keys)
        if freeze:
            assert changed == 0.0, "frozen BN buffers must not move"
        else:
            assert changed > 0.0, "train-mode BN buffers must update"
        # weights still train in both modes
        wkey = next(k for k in params if k.endswith("conv1.weight"))
        assert float(np.abs(np.asarray(params2[wkey])
                            - np.asarray(params[wkey])).max()) > 0


def test_optimizer_masks_buffers():
    """AdamW (incl. weight decay) must never perturb running stats even
    though they receive nonzero gradients through eval-mode BN."""
    import optax
    from mpiflow_tpu.config import TrainConfig
    from mpiflow_tpu.train.raft_train import make_optimizer
    cfg = TrainConfig(lr=1e-2, wdecay=1e-2, num_steps=10)
    params = {"w.weight": jnp.ones((4,)),
              "bn.running_mean": jnp.full((4,), 3.0)}
    grads = {"w.weight": jnp.ones((4,)),
             "bn.running_mean": jnp.ones((4,))}
    tx, _ = make_optimizer(cfg)
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["bn.running_mean"]),
                                  np.full((4,), 3.0))
    assert float(jnp.abs(new["w.weight"] - 1.0).max()) > 0


# ------------------------------------------------------ warm-start low flow
def test_raft_with_low_returns_final_low_res_flow():
    from mpiflow_tpu.models.raft import raft_forward, raft_test_mode
    from mpiflow_tpu.config import RAFTConfig
    params = _tiny_big_raft_params()
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    low, up = raft_test_mode(params, img1, img2, RAFTConfig(), iters=3)
    assert low.shape == (1, 8, 12, 2)
    assert up.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(low)).all()
    # warm start: feeding flow_init=low must be accepted and change preds
    preds0 = raft_forward(params, img1, img2, RAFTConfig(), iters=2)
    preds1 = raft_forward(params, img1, img2, RAFTConfig(), iters=2,
                          flow_init=low)
    assert float(jnp.abs(preds1 - preds0).max()) > 0


# -------------------------------------------------------- fail-fast CLI etc.
def _make_base(tmp_path, n=1, h=40, w=56):
    from mpiflow_tpu.io.image import save_image_u8
    rng = np.random.RandomState(0)
    base = str(tmp_path / "base")
    for sub in ("images", "disps", "masks"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for i in range(n):
        name = f"{i:03d}.png"
        save_image_u8(os.path.join(base, "images", name),
                      (rng.rand(h, w, 3) * 255).astype(np.uint8))
        save_image_u8(os.path.join(base, "disps", name),
                      (np.linspace(0.2, 0.9, h)[:, None]
                       * np.ones((h, w)) * 255).astype(np.uint8))
        mask = np.zeros((h, w), np.uint8)
        mask[10:25, 15:35] = 1
        save_image_u8(os.path.join(base, "masks", name), mask)
    return base


def test_generate_cli_fails_fast_on_missing_ckpt(tmp_path):
    from mpiflow_tpu.cli.generate import main
    base = _make_base(tmp_path)
    argv = ["--base", base, "--out", str(tmp_path / "out"),
            "--width", "56", "--height", "40", "--repeat", "1",
            "--planes", "8", "--predictor", "adampi",
            "--ckpt_path", str(tmp_path / "missing.pth")]
    with pytest.raises(SystemExit) as ei:
        main(argv)
    assert "could not be loaded" in str(ei.value)


def test_generate_cli_fallback_flag_allows_geometric(tmp_path):
    from mpiflow_tpu.cli.generate import main
    base = _make_base(tmp_path)
    out = str(tmp_path / "out")
    argv = ["--base", base, "--out", out,
            "--width", "56", "--height", "40", "--repeat", "1",
            "--planes", "8", "--predictor", "adampi",
            "--ckpt_path", str(tmp_path / "missing.pth"),
            "--allow_geometric_fallback", "--render_mode", "preblocked"]
    assert main(argv) == 0
    assert os.path.exists(os.path.join(out, "flows", "000_0.flo"))


def test_generate_cli_bilateral_and_flow_viz(tmp_path):
    from mpiflow_tpu.cli.generate import main
    base = _make_base(tmp_path)
    out = str(tmp_path / "out")
    argv = ["--base", base, "--out", out,
            "--width", "56", "--height", "40", "--repeat", "1",
            "--planes", "8", "--predictor", "geometric",
            "--bilateral", "1", "--flow_viz", "on",
            "--render_mode", "preblocked"]
    assert main(argv) == 0
    assert os.path.exists(os.path.join(out, "flow_viz", "000_0.png"))


# ----------------------------------------------------------- metrics logger
def test_metrics_logger_jsonl(tmp_path):
    import json
    from mpiflow_tpu.train.logger import MetricsLogger
    msgs = []
    with MetricsLogger(str(tmp_path), sum_freq=2,
                       print_fn=msgs.append) as lg:
        lg.push(1, {"loss": 2.0, "epe": 4.0}, batch_size=2, lr=1e-4)
        lg.push(2, {"loss": 1.0, "epe": 2.0}, batch_size=2, lr=1e-4)
        lg.write_dict(2, {"kitti-epe": 3.25}, split="val")
    lines = [json.loads(l) for l in
             open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert lines[0]["split"] == "train"
    assert lines[0]["loss"] == pytest.approx(1.5)   # 100-step running mean
    assert lines[0]["epe"] == pytest.approx(3.0)
    assert lines[0]["lr"] == pytest.approx(1e-4)
    assert "img_per_sec" in lines[0]
    assert lines[1] == {"step": 2, "split": "val", "kitti-epe": 3.25}
    assert msgs  # printed too


# ------------------------------------------------- sparse flow splat resize
def test_resize_sparse_flow_map_splat_semantics():
    """The sparse resize must splat (not interpolate): scaled vectors land
    on rounded output pixels, collisions resolve last-writer-wins in
    row-major source order, and the row-0/col-0 output border stays
    invalid (RAFT/core/utils/augmentor.py:161-194 semantics)."""
    from mpiflow_tpu.data.augmentor import SparseFlowAugmentor

    rng = np.random.RandomState(7)
    h, w = 23, 31
    flow = rng.randn(h, w, 2).astype(np.float32) * 10
    valid = (rng.rand(h, w) > 0.6).astype(np.float32)
    fx, fy = 0.37, 0.61  # shrink hard enough to force collisions
    got_f, got_v = SparseFlowAugmentor.resize_sparse_flow_map(
        flow, valid, fx, fy)

    h1, w1 = int(round(h * fy)), int(round(w * fx))
    want_f = np.zeros((h1, w1, 2), np.float32)
    want_v = np.zeros((h1, w1), np.int32)
    n_cand = n_kept = 0
    for y in range(h):          # row-major: later rows overwrite earlier
        for x in range(w):
            if valid[y, x] < 1:
                continue
            n_cand += 1
            xo = int(np.round(x * fx))
            yo = int(np.round(y * fy))
            if 0 < xo < w1 and 0 < yo < h1:
                n_kept += 1
                want_f[yo, xo] = [flow[y, x, 0] * fx, flow[y, x, 1] * fy]
                want_v[yo, xo] = 1
    assert n_kept < n_cand < h * w  # the case exercises both filters
    assert got_v.shape == (h1, w1) and got_f.shape == (h1, w1, 2)
    assert np.array_equal(got_v, want_v)
    assert np.allclose(got_f, want_f, atol=1e-5)
    assert got_v[0, :].max() == 0 and got_v[:, 0].max() == 0


def test_resize_sparse_flow_map_upscale_keeps_all_interior():
    """Upscaling maps distinct sources to distinct outputs: every valid
    interior pixel must survive with its vector scaled exactly."""
    from mpiflow_tpu.data.augmentor import SparseFlowAugmentor

    flow = np.zeros((8, 8, 2), np.float32)
    valid = np.zeros((8, 8), np.float32)
    flow[3, 4] = [2.0, -3.0]
    valid[3, 4] = 1
    got_f, got_v = SparseFlowAugmentor.resize_sparse_flow_map(
        flow, valid, 2.0, 2.0)
    assert got_v.sum() == 1 and got_v[6, 8] == 1
    assert np.allclose(got_f[6, 8], [4.0, -6.0])
