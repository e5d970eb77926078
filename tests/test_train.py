import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpiflow_tpu.config import RAFTConfig, TrainConfig
from mpiflow_tpu.train.raft_train import (
    sequence_loss, make_optimizer, make_train_step, Trainer,
    onecycle_linear_schedule,
)


def test_param_manifest_matches_torch_state_dict(golden):
    """raft_param_shapes must enumerate exactly the torch state dict
    (modulo norm3/downsample.1 aliasing and instance norms)."""
    from mpiflow_tpu.models.raft_init import raft_param_shapes
    g = golden("raft")
    torch_keys = {}
    for k, shape_s in zip(g["sd_keys"], g["sd_shapes"]):
        shape = tuple(int(s) for s in shape_s.split(",") if s)
        if k.endswith("num_batches_tracked") or len(shape) == 0:
            continue
        if len(shape) == 4:  # OIHW -> HWIO
            shape = (shape[2], shape[3], shape[1], shape[0])
        torch_keys[k] = shape
    mine = raft_param_shapes(small=False)
    # torch also exposes norm3 aliases of downsample.1 (fnet/cnet res blocks)
    alias = {k for k in torch_keys if ".norm3." in k and "layer" in k}
    missing = set(torch_keys) - set(mine) - alias
    extra = set(mine) - set(torch_keys)
    assert not missing, f"missing: {sorted(missing)[:8]}"
    assert not extra, f"extra: {sorted(extra)[:8]}"
    for k, s in mine.items():
        assert torch_keys[k] == s, (k, torch_keys[k], s)


def test_sequence_loss_matches_reference_semantics():
    rng = np.random.RandomState(0)
    preds = jnp.asarray(rng.randn(3, 2, 8, 10, 2).astype(np.float32))
    gt = jnp.asarray(rng.randn(2, 8, 10, 2).astype(np.float32))
    valid = jnp.asarray((rng.rand(2, 8, 10) > 0.3).astype(np.float32))
    loss, metrics = sequence_loss(preds, gt, valid, gamma=0.8)

    # numpy oracle of RAFT/train.py:47-72
    p, g, v = map(np.asarray, (preds, gt, valid))
    mag = np.sqrt((g ** 2).sum(-1))
    vm = (v >= 0.5) & (mag < 400)
    ref_loss = 0.0
    for i in range(3):
        w = 0.8 ** (3 - i - 1)
        ref_loss += w * (vm[..., None] * np.abs(p[i] - g)).mean()
    epe = np.sqrt(((p[-1] - g) ** 2).sum(-1))[vm]
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-6)
    np.testing.assert_allclose(float(metrics["epe"]), epe.mean(), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["1px"]), (epe < 1).mean(),
                               rtol=1e-5)


def test_onecycle_schedule_shape():
    sched = onecycle_linear_schedule(1e-4, 1000, pct_start=0.05)
    assert float(sched(0)) == pytest.approx(1e-4 / 25, rel=1e-4)
    assert float(sched(50)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(1000)) == pytest.approx(1e-4 / 25 / 1e4, rel=1e-2)
    # monotone up then down
    assert float(sched(25)) < float(sched(50))
    assert float(sched(500)) < float(sched(50))


def test_train_step_improves_loss():
    """One small RAFT, random data: a few steps must reduce the loss."""
    from mpiflow_tpu.cli.train_raft import init_random_params
    cfg = TrainConfig(lr=1e-3, num_steps=50, iters=2, batch_size=2,
                      image_size=(64, 96))
    model_cfg = RAFTConfig.small_config()
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(small=True, seed=0).items()}
    tx, _ = make_optimizer(cfg)
    step = make_train_step(cfg, model_cfg, tx, donate=False)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32) * 255)
    flow = jnp.asarray(rng.randn(2, 64, 96, 2).astype(np.float32))
    valid = jnp.ones((2, 64, 96), jnp.float32)

    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, img1, img2,
                                          flow, valid)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_block_up_loss_matches_pixel_layout():
    """block_up keeps predictions in [N,h,w,64,2]; the loss over them with
    a space-to-depth'd ground truth must equal the pixel-layout loss, and
    so must its parameter gradients (layout-only rewrite)."""
    import jax
    from mpiflow_tpu.cli.train_raft import init_random_params
    from mpiflow_tpu.models.raft import (block_to_pixel, pixel_to_block,
                                         raft_forward)
    model_cfg = RAFTConfig()
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(small=False, seed=0).items()}
    rng = np.random.RandomState(1)
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    flow = jnp.asarray(rng.randn(1, 64, 96, 2).astype(np.float32) * 3)
    valid = jnp.asarray((rng.rand(1, 64, 96) > 0.1).astype(np.float32))

    def loss_pix(p):
        preds = raft_forward(p, img1, img2, model_cfg, iters=2)
        return sequence_loss(preds, flow, valid)[0]

    def loss_blk(p):
        preds = raft_forward(p, img1, img2, model_cfg, iters=2,
                             block_up=True)
        return sequence_loss(preds, pixel_to_block(flow),
                             pixel_to_block(valid))[0]

    # prediction layouts are exact transposes of each other
    pix = raft_forward(params, img1, img2, model_cfg, iters=2)
    blk = raft_forward(params, img1, img2, model_cfg, iters=2,
                       block_up=True)
    np.testing.assert_allclose(np.asarray(jax.vmap(block_to_pixel)(blk)),
                               np.asarray(pix), rtol=0, atol=1e-5)

    lp, gp = jax.value_and_grad(loss_pix)(params)
    lb, gb = jax.value_and_grad(loss_blk)(params)
    assert float(lp) == pytest.approx(float(lb), rel=1e-5)
    for k in gp:
        np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(gp[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_dp_train_step_on_mesh():
    """The full training step jits and runs sharded over the 8-device mesh
    (the multi-chip path the driver dry-runs)."""
    from mpiflow_tpu.cli.train_raft import init_random_params
    from mpiflow_tpu.parallel.mesh import make_mesh, shard_batch
    mesh = make_mesh()
    n = mesh.devices.size
    assert n == 8

    cfg = TrainConfig(lr=1e-4, num_steps=10, iters=2, batch_size=n,
                      image_size=(64, 96))
    model_cfg = RAFTConfig.small_config()
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(small=True, seed=0).items()}
    tx, _ = make_optimizer(cfg)
    step = make_train_step(cfg, model_cfg, tx, donate=False, mesh=mesh)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    batch = (rng.rand(n, 64, 96, 3).astype(np.float32) * 255,
             rng.rand(n, 64, 96, 3).astype(np.float32) * 255,
             rng.randn(n, 64, 96, 2).astype(np.float32),
             np.ones((n, 64, 96), np.float32))
    with mesh:
        sharded = tuple(shard_batch(mesh, b) for b in batch)
        params2, opt_state, metrics = step(params, opt_state, *sharded)
    assert np.isfinite(float(metrics["loss"]))
    # params must have actually changed
    diff = sum(float(jnp.abs(params2[k] - params[k]).sum()) for k in params)
    assert diff > 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    """save_orbax/restore_orbax must round-trip params + optimizer state
    (exact resume -- an upgrade over the reference, which restarts its
    optimizer on --restore_ckpt)."""
    from mpiflow_tpu.cli.train_raft import init_random_params
    from mpiflow_tpu.train.raft_train import Trainer
    pytest_orbax = __import__("pytest").importorskip("orbax.checkpoint")
    cfg = TrainConfig(lr=1e-3, num_steps=10, iters=2, batch_size=1,
                      image_size=(64, 96))
    tr = Trainer(cfg, RAFTConfig.small_config(), log_fn=lambda *a: None)
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(small=True, seed=0).items()}
    state = tr.init_state(params)
    # advance one step so opt_state is non-trivial
    rng = np.random.RandomState(0)
    b = (jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255),
         jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255),
         jnp.asarray(rng.randn(1, 64, 96, 2).astype(np.float32)),
         jnp.ones((1, 64, 96), jnp.float32))
    state.params, state.opt_state, _ = tr.step_fn(state.params,
                                                  state.opt_state, *b)
    state.step = 1
    tr.save_orbax(state, str(tmp_path))
    like = tr.init_state(params)
    like.step = 0
    restored = tr.restore_orbax(str(tmp_path), 1, like)
    assert restored.step == 1
    for k in state.params:
        np.testing.assert_array_equal(np.asarray(restored.params[k]),
                                      np.asarray(state.params[k]))
    # optimizer state round-trips with structure intact (usable for update)
    import optax
    upd, _ = tr.tx.update(
        jax.tree_util.tree_map(jnp.zeros_like, restored.params),
        restored.opt_state, restored.params)
    jax.block_until_ready(upd)


def test_orbax_latest_and_prune(tmp_path):
    """Crash-resume helpers: latest_orbax_step picks the newest complete
    step dir (ignoring orbax tmp dirs), prune_orbax keeps only `keep`."""
    from mpiflow_tpu.train.raft_train import Trainer
    import os
    assert Trainer.latest_orbax_step(str(tmp_path / "nope")) is None
    for d in ("step_100", "step_500",
              "step_700.orbax-checkpoint-tmp-123"):  # in-flight write
        os.makedirs(tmp_path / d)
    assert Trainer.latest_orbax_step(str(tmp_path)) == 500
    Trainer.prune_orbax(str(tmp_path), keep=500)
    left = sorted(os.listdir(tmp_path))
    assert "step_500" in left and "step_100" not in left


def test_run_zero_steps_is_noop(tmp_path):
    """run(num_steps=0) must train nothing (resume landed on the final
    checkpoint); only num_steps=None falls back to cfg.num_steps."""
    from mpiflow_tpu.cli.train_raft import init_random_params
    from mpiflow_tpu.train.raft_train import Trainer
    cfg = TrainConfig(lr=1e-3, num_steps=10, iters=2, batch_size=1,
                      image_size=(64, 96))
    tr = Trainer(cfg, RAFTConfig.small_config(), log_fn=lambda *a: None,
                 run_dir=str(tmp_path))
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(small=True, seed=0).items()}
    state = tr.init_state(params)
    state.step = 10

    def exploding_iter():
        raise AssertionError("run(num_steps=0) pulled a batch")
        yield  # pragma: no cover

    out = tr.run(state, exploding_iter(), num_steps=0)
    assert out.step == 10
