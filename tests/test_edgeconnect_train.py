"""EdgeConnect stage-1 adversarial trainer (train/edgeconnect_train.py).

The reference consumes pretrained ecweight/*.pth (warpback/networks.py:11-26)
and ships no trainer; these tests pin our TPU-native training loop: spectral
norm power iteration, loss mechanics, losses decrease at CI scale, DP-grads
equivalence, and checkpoint round-trip into the stage-2 synthesizer.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpiflow_tpu.models.edgeconnect import (
    discriminator, random_discriminator_params, spectral_normalize)
from mpiflow_tpu.train.edgeconnect_train import (
    ECTrainer, load_ec_checkpoint, save_ec_checkpoint)
from mpiflow_tpu.warpback.datasets import random_edgeconnect_params


def _toy_batch(b=2, h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    rgb = jnp.asarray(rng.rand(b, 3, h, w).astype(np.float32))
    disp = jnp.asarray(
        (0.2 + 0.6 * rng.rand(b, h, w)).astype(np.float32))
    mask = np.ones((b, h, w), np.float32)
    mask[:, 20:40, 24:48] = 0.0                      # a hole per sample
    return rgb, disp, jnp.asarray(mask)


def test_spectral_normalize_bounds_singular_value():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(4, 4, 8, 16).astype(np.float32) * 3.0)
    u = jnp.asarray(rng.randn(16).astype(np.float32))
    # power iteration converges; after a few steps sigma(w_sn) ~ 1
    for _ in range(30):
        w_sn, u = spectral_normalize(w, u)
    mat = np.asarray(w_sn).reshape(-1, 16)
    sigma = np.linalg.svd(mat, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 1e-3


def test_discriminator_shapes_and_u_update():
    params = random_discriminator_params(3, seed=0)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3),
                    jnp.float32)
    logits, feats, new_u = discriminator(params, x)
    # three stride-2 convs (64->8) then two k4 s1 p1 convs (8->7->6)
    assert logits.shape == (2, 6, 6, 1)
    assert len(feats) == 5
    for k, v in new_u.items():
        assert not np.allclose(np.asarray(v), np.asarray(params[k]))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v)), 1.0,
                                   rtol=1e-4)


@pytest.mark.parametrize("kind", ["edge", "inpaint", "disp"])
def test_losses_finite_and_decrease(kind):
    init = random_edgeconnect_params(seed=0)
    trainer = ECTrainer(kind)
    state = trainer.init_state(init[kind], disc_seed=1)
    rgb, disp, mask = _toy_batch()
    history = []
    for _ in range(8):
        metrics = trainer.run_step(state, rgb, disp, mask)
        vals = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        history.append(vals)
    # the generator's reconstruction term must decrease on a fixed batch
    key = "edge_l1" if kind == "edge" else "g_l1"
    assert history[-1][key] < history[0][key], (history[0], history[-1])
    assert state.step == 8


def test_dp_grads_match_single():
    """The pmean'd per-device GRADIENTS from the shard_map'd DP step must
    equal the single-program gradients on the same global batch. (Comparing
    params after an Adam b1=0 step only tests gradient signs -- near-zero
    grads flip -- so compare the gradients themselves.)"""
    init = random_edgeconnect_params(seed=0)
    rgb, disp, mask = _toy_batch(b=2)

    t1 = ECTrainer("edge")
    s1 = t1.init_state(init["edge"], disc_seed=1)

    def gloss(gen_params, disc_params, rgb, disp, mask):
        g_loss, _, _, _ = t1.losses(gen_params, disc_params, rgb, disp, mask)
        return g_loss

    g_single = jax.grad(gloss)(s1.gen_params, s1.disc_params,
                               rgb, disp, mask)

    from jax.sharding import PartitionSpec as P
    from mpiflow_tpu.parallel.mesh import DATA_AXIS, make_mesh
    mesh = make_mesh(num_devices=2)
    dp = jax.jit(jax.shard_map(
        lambda gp, dp_, r, d, m: jax.lax.pmean(
            jax.grad(gloss)(gp, dp_, r, d, m), DATA_AXIS),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False))
    g_dp = dp(s1.gen_params, s1.disc_params, rgb, disp, mask)

    checked = 0
    for k in g_single:
        a, b = np.asarray(g_single[k]), np.asarray(g_dp[k])
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5, err_msg=k)
        checked += int(np.abs(a).max() > 0)
    assert checked > 10          # real, nonzero gradients were compared


def test_checkpoint_roundtrip_feeds_stage2(tmp_path):
    """A trained checkpoint is a complete ec_params tree the stage-2
    synthesizer consumes directly."""
    init = random_edgeconnect_params(seed=3)
    path = str(tmp_path / "ec.npz")
    save_ec_checkpoint(path, init)
    loaded = load_ec_checkpoint(path)
    assert set(loaded) == {"edge", "inpaint", "disp"}
    for name in loaded:
        assert set(loaded[name]) == set(init[name])
        for k in loaded[name]:
            np.testing.assert_array_equal(np.asarray(loaded[name][k]),
                                          np.asarray(init[name][k]))
    from mpiflow_tpu.warpback.datasets import inpaint_rgbd_batch
    rgb, disp, mask = _toy_batch(b=1)
    img_m, disp_m = inpaint_rgbd_batch(loaded, rgb, disp, mask)
    assert img_m.shape == (1, 3, 64, 64)
    assert np.isfinite(np.asarray(img_m)).all()
    assert np.isfinite(np.asarray(disp_m)).all()


def test_cli_smoke(tmp_path):
    """End-to-end CLI: synthesize scenes, train a few steps, checkpoint."""
    from mpiflow_tpu.cli.train_edgeconnect import main
    out = str(tmp_path / "ec.npz")
    rc = main(["--width", "64", "--height", "64", "--synth_images", "2",
               "--num_steps", "2", "--batch_size", "1",
               "--models", "edge",
               "--ckpt_out", out,
               "--run_dir", str(tmp_path / "run")])
    assert rc == 0
    loaded = load_ec_checkpoint(out)
    assert set(loaded) == {"edge", "inpaint", "disp"}


def test_partial_checkpoint_resume(tmp_path):
    """The trainer CLI's per-model partial checkpoint lets a restarted run
    skip already-trained models: a partial holding only `edge` loads as a
    one-entry dict, and re-saving with more models accumulates."""
    init = random_edgeconnect_params(seed=0)
    partial = str(tmp_path / "ec.npz.partial.npz")
    save_ec_checkpoint(partial, {"edge": init["edge"]})
    loaded = load_ec_checkpoint(partial)
    assert set(loaded) == {"edge"}
    save_ec_checkpoint(partial, {"edge": init["edge"],
                                 "inpaint": init["inpaint"]})
    assert set(load_ec_checkpoint(partial)) == {"edge", "inpaint"}
    for k, v in loaded["edge"].items():
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(init["edge"][k]))
