"""AdaMPI training loop (train/adampi_train.py + cli/train_adampi.py).

The reference has no AdaMPI trainer (it ships inference weights only);
these tests gate the TPU-native training loop built on its warpback
stage-2 supervision pipeline: loss components, trend at CI scale, the
data-parallel shard_map step, and the .npz checkpoint round trip into the
generation pipeline's predictor loader.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpiflow_tpu.train.adampi_train import (
    AdaMPITrainConfig, adampi_sample_loss, he_adampi_params,
    make_adampi_optimizer, make_adampi_train_step, pixel_intrinsics,
    scale_shift_invariant_l1, ssim)
from mpiflow_tpu.warpback.datasets import (DEFAULT_TRANS_RANGE, K_NORM,
                                           make_stage2_synthesizer,
                                           sample_warpback_pose)

# the decoder's receptive-field extension (conv_down1/2 + 2x upsample,
# decoder.py:127-131) needs H, W divisible by 128
H, W, S, B = 128, 128, 2, 2


def _scene_batch(seed=0, n=B, h=H, w=W):
    from mpiflow_tpu.utils.synth import procedural_scene
    rng = np.random.RandomState(seed)
    rgb = np.stack([procedural_scene(rng, h, w)[0].transpose(2, 0, 1)
                    for _ in range(n)])
    rng2 = np.random.RandomState(seed)
    disp = np.stack([procedural_scene(rng2, h, w)[1] for _ in range(n)])
    poses = [sample_warpback_pose(rng, DEFAULT_TRANS_RANGE)
             for _ in range(n)]
    ext_fwd = np.stack([p[0] for p in poses])
    ext_back = np.stack([p[1] for p in poses])
    return (rgb.astype(np.float32), disp.astype(np.float32),
            ext_fwd, ext_back)


def test_ssim_bounds():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(3, 32, 32), jnp.float32)
    s_self = np.asarray(ssim(x, x))
    assert np.all(s_self > 0.99)
    y = jnp.asarray(rng.rand(3, 32, 32), jnp.float32)
    s_cross = np.asarray(ssim(x, y))
    assert s_cross.mean() < 0.9
    assert np.all(np.abs(s_cross) <= 1.0 + 1e-5)


def test_ssi_l1_scale_shift_invariant():
    rng = np.random.RandomState(1)
    tgt = jnp.asarray(rng.rand(16, 16), jnp.float32)
    pred = tgt * 0.3 + 0.5 + jnp.asarray(rng.randn(16, 16) * 0.01,
                                         jnp.float32)
    mask = jnp.ones((16, 16), jnp.float32)
    base = float(scale_shift_invariant_l1(pred, tgt, mask))
    scaled = float(scale_shift_invariant_l1(pred * 7.0 - 2.0, tgt, mask))
    assert base == pytest.approx(scaled, rel=1e-3, abs=1e-5)
    assert float(scale_shift_invariant_l1(tgt, tgt, mask)) < 1e-6
    # the aligned residual is the (rescaled) noise floor, far below the
    # raw |pred - tgt| gap (~0.35)
    assert base < 0.05
    assert float(jnp.abs(pred - tgt).mean()) > 0.2


def _tiny_cfg(**kw):
    kw.setdefault("num_planes", S)
    kw.setdefault("batch_size", B)
    kw.setdefault("lr", 1e-3)
    return AdaMPITrainConfig(**kw)


@pytest.fixture(scope="module")
def stage2_batch():
    rgb, disp, ext_fwd, ext_back = _scene_batch()
    synth = make_stage2_synthesizer(None, diffusion_iters=16)
    out = synth(jnp.asarray(rgb), jnp.asarray(disp), jnp.asarray(ext_fwd))
    return out, jnp.asarray(ext_back)


def test_sample_loss_finite_and_components(stage2_batch):
    batch, ext_back = stage2_batch
    cfg = _tiny_cfg()
    params = he_adampi_params(0)
    K_pix = pixel_intrinsics(K_NORM, H, W)
    loss, metrics = adampi_sample_loss(
        params, batch["src_rgb"][0], batch["src_disp"][0],
        batch["tgt_rgb"][0], batch["tgt_disp"][0], ext_back[0], K_pix, cfg)
    assert np.isfinite(float(loss))
    for k in ("l_rgb", "l_ssim", "l_disp", "psnr"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["l_rgb"]) >= 0.0
    assert float(metrics["l_disp"]) >= 0.0


def test_train_loss_decreases(stage2_batch):
    batch, ext_back = stage2_batch
    cfg = _tiny_cfg(num_steps=12)
    params = he_adampi_params(0)
    tx = make_adampi_optimizer(cfg)
    opt_state = tx.init(params)
    K_pix = pixel_intrinsics(K_NORM, H, W)
    step = make_adampi_train_step(cfg, tx, K_pix, mesh=None, donate=False)
    losses = []
    args = (batch["src_rgb"], batch["src_disp"], batch["tgt_rgb"],
            batch["tgt_disp"], ext_back)
    for _ in range(cfg.num_steps):
        params, opt_state, metrics = step(params, opt_state, *args)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < losses[0], losses
    # buffers (BN running stats) must never move
    assert np.allclose(
        np.asarray(params["encoder.encoder.bn1.running_mean"]), 0.0)
    assert np.allclose(
        np.asarray(params["encoder.encoder.bn1.running_var"]), 1.0)


def test_dp_grads_match_single(stage2_batch):
    """pmean'd per-device gradients == the global-batch gradients.

    Comparing PARAMS after an Adam step would only exercise gradient
    signs (step-1 Adam update is ~lr*sign(g)); comparing the gradients
    themselves catches scale/aggregation bugs too."""
    from jax.sharding import PartitionSpec as P
    from mpiflow_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
    batch, ext_back = stage2_batch
    ndev = len(jax.devices())
    if ndev < 2:
        pytest.skip("needs a multi-device mesh")
    # tile the 2-sample batch to one sample per device
    reps = ndev // B
    big = {k: jnp.tile(v, (reps,) + (1,) * (v.ndim - 1))
           for k, v in batch.items()}
    ext_big = jnp.tile(ext_back, (reps, 1, 1))

    cfg = _tiny_cfg(batch_size=ndev)
    params = he_adampi_params(0)
    K_pix = pixel_intrinsics(K_NORM, H, W)
    args = (big["src_rgb"], big["src_disp"], big["tgt_rgb"],
            big["tgt_disp"], ext_big)

    def loss_fn(p, sr, sd, tr, td, G):
        losses, _ = jax.vmap(
            lambda a, b, c, d, g: adampi_sample_loss(
                p, a, b, c, d, g, K_pix, cfg))(sr, sd, tr, td, G)
        return losses.mean()

    g_single = jax.jit(jax.grad(loss_fn))(params, *args)

    mesh = make_mesh()

    def dp_grads(p, *a):
        return jax.lax.pmean(jax.grad(loss_fn)(p, *a), DATA_AXIS)

    dp = jax.jit(jax.shard_map(
        dp_grads, mesh=mesh,
        in_specs=(P(),) + (P("data"),) * 5, out_specs=P(),
        check_vma=False))
    g_dp = dp(params, *(shard_batch(mesh, a) for a in args))

    for k in g_single:
        np.testing.assert_allclose(np.asarray(g_dp[k]),
                                   np.asarray(g_single[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_cli_and_npz_predictor_roundtrip(tmp_path):
    """End to end: train 2 steps via the CLI, then feed the saved .npz to
    the generation pipeline's predictor loader (regression for the
    double-convert bug: .npz archives are already HWIO)."""
    from mpiflow_tpu.cli.train_adampi import main
    wd = str(tmp_path / "run")
    rc = main(["--work_dir", wd, "--width", str(W), "--height", str(H),
               "--planes", str(S), "--num_steps", "2", "--batch_size",
               str(B), "--num_images", "2", "--ckpt_every", "1000",
               "--lr", "1e-3"])
    assert rc == 0
    ckpt = f"{wd}/checkpoints/2_adampi.npz"
    import os
    assert os.path.exists(ckpt)
    assert os.path.exists(f"{wd}/metrics.jsonl")

    from mpiflow_tpu.models.adampi import adampi_forward, load_adampi_predictor
    predict = load_adampi_predictor(ckpt, width=W, height=H,
                                    plane_chunk=0,
                                    compute_dtype=jnp.float32)
    rgb, disp, _, _ = _scene_batch(seed=3, n=1)
    img, dsp = jnp.asarray(rgb[0]), jnp.asarray(disp[0])
    mpi_rgb, mpi_sigma = predict(img, dsp)
    assert mpi_rgb.shape == (S, 3, H, W)
    assert mpi_sigma.shape == (S, 1, H, W)
    assert bool(jnp.isfinite(mpi_rgb).all())

    # the loaded forward must equal the forward through the raw params
    # (catches any spurious second transpose on load)
    raw = dict(np.load(ckpt))
    raw.pop("__num_planes__", None)
    params = {k: jnp.asarray(v) for k, v in raw.items()}
    ref_rgb, ref_sigma, _ = adampi_forward(params, img, dsp, S)
    assert float(jnp.abs(mpi_rgb - ref_rgb).max()) < 1e-5
    assert float(jnp.abs(mpi_sigma - ref_sigma).max()) < 1e-5


def test_cli_pool_path_and_resume(tmp_path):
    """--pool_per_scene pre-renders the pair pool once and cycles it
    (the product-scale lever: per-step synthesis cost ~6.7 s/step on the
    tunneled chip, logs/full_loop_product.log). Mechanics gated here:
    the pool path trains and checkpoints, and a --start_step restart
    (which rebuilds the identical pool — the build consumes the RNG
    first in the same order) completes the horizon."""
    from mpiflow_tpu.cli.train_adampi import main
    import os
    wd = str(tmp_path / "pool_run")
    rc = main(["--work_dir", wd, "--width", str(W), "--height", str(H),
               "--planes", str(S), "--num_steps", "4", "--batch_size",
               str(B), "--num_images", "2", "--pool_per_scene", "2",
               "--ckpt_every", "2", "--lr", "1e-3"])
    assert rc == 0
    assert os.path.exists(f"{wd}/checkpoints/4_adampi.npz")

    # resume from the step-2 periodic checkpoint: trains 2 more steps,
    # absolute checkpoint names continue
    os.remove(f"{wd}/checkpoints/4_adampi.npz")
    rc = main(["--work_dir", wd, "--width", str(W), "--height", str(H),
               "--planes", str(S), "--num_steps", "4", "--batch_size",
               str(B), "--num_images", "2", "--pool_per_scene", "2",
               "--ckpt_every", "2", "--lr", "1e-3",
               "--restore_ckpt", f"{wd}/checkpoints/2_adampi.npz",
               "--start_step", "2"])
    assert rc == 0
    assert os.path.exists(f"{wd}/checkpoints/4_adampi.npz")
