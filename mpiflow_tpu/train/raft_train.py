"""RAFT training: sequence loss, AdamW + one-cycle LR, data-parallel step.

Reference recipe (RAFT/train.py + train_standard.sh): gamma-weighted L1 over
the iteration sequence with validity/max-flow masking (:47-72), AdamW +
OneCycleLR(pct_start=0.05, linear) (:79-86), grad-norm clip 1.0 (:177), AMP.
The reference scales with single-host nn.DataParallel (:138); here the step
is jitted with the batch sharded over the mesh "data" axis -- XLA inserts
the gradient all-reduce over ICI.

BatchNorms run in eval mode (frozen) by default -- matching
model.freeze_bn(), which the reference applies for every stage except
chairs (train.py:146-148); cfg.freeze_bn=False enables train-mode BN with
momentum-updated running stats for from-scratch chairs training.
"""
from __future__ import annotations

import dataclasses
import os

from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mpiflow_tpu.config import RAFTConfig, TrainConfig
from mpiflow_tpu.models.raft import raft_forward


def sequence_loss(flow_preds: jnp.ndarray, flow_gt: jnp.ndarray,
                  valid: jnp.ndarray, gamma: float = 0.8,
                  max_flow: float = 400.0):
    """Reference sequence_loss (RAFT/train.py:47-72), NHWC.

    flow_preds [iters,N,H,W,2]; flow_gt [N,H,W,2]; valid [N,H,W].
    Layout-agnostic: every reduction is pixelwise, so block-layout inputs
    (preds [iters,N,h,w,64,2], gt [N,h,w,64,2], valid [N,h,w,64] -- see
    models/raft.pixel_to_block) give the same loss and metrics up to fp
    reassociation. Returns (loss, metrics dict).
    """
    n = flow_preds.shape[0]
    mag = jnp.sqrt((flow_gt ** 2).sum(-1))
    valid = (valid >= 0.5) & (mag < max_flow)
    vmask = valid[..., None].astype(flow_preds.dtype)

    weights = gamma ** (n - 1 - jnp.arange(n, dtype=flow_preds.dtype))
    abs_err = jnp.abs(flow_preds - flow_gt[None])          # [it,N,...,2]
    per_iter = (vmask[None] * abs_err).reshape(n, -1).mean(axis=1)
    loss = (weights * per_iter).sum()

    epe = jnp.sqrt(((flow_preds[-1] - flow_gt) ** 2).sum(-1))
    vsum = jnp.maximum(valid.sum(), 1)
    epe_v = jnp.where(valid, epe, 0.0)
    metrics = {
        "epe": epe_v.sum() / vsum,
        "1px": jnp.where(valid, (epe < 1).astype(jnp.float32), 0).sum() / vsum,
        "3px": jnp.where(valid, (epe < 3).astype(jnp.float32), 0).sum() / vsum,
        "5px": jnp.where(valid, (epe < 5).astype(jnp.float32), 0).sum() / vsum,
    }
    return loss, metrics


def onecycle_linear_schedule(peak_lr: float, total_steps: int,
                             pct_start: float = 0.05, div_factor: float = 25.0,
                             final_div_factor: float = 1e4):
    """torch OneCycleLR(anneal_strategy='linear') equivalent
    (RAFT/train.py:83-84 uses num_steps+100 total)."""
    init = peak_lr / div_factor
    final = init / final_div_factor
    warm = max(int(total_steps * pct_start), 1)
    return optax.join_schedules(
        [optax.linear_schedule(init, peak_lr, warm),
         optax.linear_schedule(peak_lr, final, total_steps - warm)],
        [warm])


def _is_buffer(key: str) -> bool:
    """Non-trainable torch buffers in the flat param dict (BN running
    stats). They enter the forward, so grads exist, but the optimizer must
    never touch them (torch buffers get no optimizer updates)."""
    return key.endswith(".running_mean") or key.endswith(".running_var") \
        or key.endswith(".num_batches_tracked")


def make_optimizer(cfg: TrainConfig):
    sched = onecycle_linear_schedule(cfg.lr, cfg.num_steps + 100)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=cfg.epsilon,
                    weight_decay=cfg.wdecay),
    )
    # buffers (BN running stats) get zero updates: they receive real
    # gradients through eval-mode BN, but torch never optimizes buffers
    tx = optax.multi_transform(
        {"train": tx, "buffer": optax.set_to_zero()},
        lambda params: {k: ("buffer" if _is_buffer(k) else "train")
                        for k in params})
    return tx, sched


@dataclasses.dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    step: int = 0


def make_train_step(cfg: TrainConfig, model_cfg: RAFTConfig, tx,
                    donate: bool = True, mesh=None):
    """Jitted data-parallel train step over NHWC batches.

    With cfg.freeze_bn=False (the reference's chairs stage,
    RAFT/train.py:146-148), batch norms run in train mode: the forward uses
    batch statistics and the momentum-updated running buffers are written
    back into params after the optimizer update (optimizer itself never
    touches buffers; see _is_buffer).

    With a mesh, the step is expressed as PER-DEVICE programs via
    jax.shard_map over the "data" axis: each device runs the full forward/
    backward on its local batch shard (Pallas kernels included -- an opaque
    pallas_call needs no GSPMD partitioning rule when the program is
    already per-device, exactly like pipeline/generator.py's sharded
    generation), gradients are pmean'd over ICI, and every device applies
    the identical optimizer update to its replicated params. This is the
    reference's nn.DataParallel (RAFT/train.py:138), which likewise runs
    alt_cuda_corr per-replica with gradient reduction, re-expressed the
    TPU way. Metrics are pmean'd per-device values; train-mode BN batch
    stats are pmean'd across devices before the buffer write-back (an
    upgrade over DataParallel, which keeps replica-0 stats only).
    """
    bn_train = not cfg.freeze_bn

    # Resolve the corr dispatch EAGERLY, before jit traces raft_forward.
    # The kernel probes are trace-safe (they evaluate on a clean-trace
    # thread), but resolving here warms their per-radius cache up front
    # and surfaces the dispatch decision in logs before the first step
    # compiles, instead of silently inside it.
    if model_cfg.corr_impl == "pallas" and not model_cfg.alternate_corr:
        import dataclasses as _dc

        from mpiflow_tpu.utils.dispatch import resolve_corr_impl
        model_cfg = _dc.replace(model_cfg, corr_impl=resolve_corr_impl(
            "pallas", model_cfg.corr_radius))

    # Block-layout loss (see models/raft.upsample_flow_convex_block): the
    # 12 predictions skip their depth-to-space relayouts; instead the
    # ground truth converts once, outside the gradient.
    block = getattr(cfg, "block_up", False) and not model_cfg.small

    def loss_fn(params, img1, img2, flow, valid):
        if bn_train:
            preds, bn_stats = raft_forward(params, img1, img2, model_cfg,
                                           iters=cfg.iters, bn_train=True,
                                           block_up=block)
        else:
            preds = raft_forward(params, img1, img2, model_cfg,
                                 iters=cfg.iters, block_up=block)
            bn_stats = {}
        if block:
            from mpiflow_tpu.models.raft import pixel_to_block
            flow = jax.lax.stop_gradient(pixel_to_block(flow))
            valid = pixel_to_block(valid)
        loss, metrics = sequence_loss(preds, flow, valid, cfg.gamma,
                                      cfg.max_flow)
        return loss, (metrics, bn_stats)

    def step(params, opt_state, img1, img2, flow, valid):
        (loss, (metrics, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, img1, img2, flow, valid)
        if mesh is not None and mesh.devices.size > 1:
            from mpiflow_tpu.parallel.mesh import DATA_AXIS
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            metrics = jax.lax.pmean(metrics, DATA_AXIS)
            if bn_stats:
                bn_stats = jax.lax.pmean(bn_stats, DATA_AXIS)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if bn_stats:
            params = dict(params)
            params.update(bn_stats)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P
        # check_vma=False: pallas_call's out_shape carries no varying-mesh-
        # axes annotation (same reason as the generator's shard_map)
        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


class Trainer:
    """Full training loop with logging + checkpointing (RAFT/train.py:136-214).

    Checkpoints are .npz parameter archives every val_freq steps and at the
    end ('checkpoints/{step}_{name}.npz' like the reference's .pth layout);
    optimizer state is checkpointed alongside for exact resume (an upgrade
    over the reference, which restarts optimizer state).
    """

    def __init__(self, cfg: TrainConfig, model_cfg: Optional[RAFTConfig] = None,
                 mesh=None, log_fn=print, run_dir: Optional[str] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg or (
            RAFTConfig.small_config() if getattr(cfg, "small", False)
            else RAFTConfig())
        # corr_impl resolves through the single dispatcher (probe-guarded);
        # multi-device meshes KEEP the Pallas kernel -- the shard_map step
        # runs it per-device, no GSPMD partitioning of the opaque kernel
        # needed (make_train_step)
        from mpiflow_tpu.utils.dispatch import resolve_corr_impl
        resolved = resolve_corr_impl(self.model_cfg.corr_impl,
                                     self.model_cfg.corr_radius)
        if resolved != self.model_cfg.corr_impl:
            import dataclasses as _dc
            self.model_cfg = _dc.replace(self.model_cfg, corr_impl=resolved)
        self.tx, self.sched = make_optimizer(cfg)
        self.step_fn = make_train_step(cfg, self.model_cfg, self.tx,
                                       mesh=mesh)
        self.mesh = mesh
        self.log_fn = log_fn
        self.sum_freq = 100
        # persistent metric trail (reference Logger writes TB scalars,
        # RAFT/train.py:89-133); None = print-only
        self.run_dir = run_dir

    def init_state(self, params: Dict) -> TrainState:
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return TrainState(params=params, opt_state=self.tx.init(params))

    def shard_batch(self, batch):
        if self.mesh is None:
            return tuple(jnp.asarray(b) for b in batch)
        from mpiflow_tpu.parallel.mesh import shard_batch
        return tuple(shard_batch(self.mesh, b) for b in batch)

    def run(self, state: TrainState, data_iter: Iterator,
            num_steps: Optional[int] = None,
            checkpoint_dir: Optional[str] = None,
            validate_fn=None, orbax_dir: Optional[str] = None) -> TrainState:
        from mpiflow_tpu.train.logger import MetricsLogger
        # explicit 0 means "no steps left" (resume landed on the final
        # checkpoint) -- only None falls back to the config horizon
        num_steps = self.cfg.num_steps if num_steps is None else num_steps
        rng = np.random.RandomState(self.cfg.seed)
        logger = MetricsLogger(self.run_dir, self.sum_freq,
                               print_fn=self.log_fn)
        for i in range(num_steps):
            batch = next(data_iter)
            if self.cfg.add_noise:
                # reference --add_noise (RAFT/train.py:167-170)
                stdv = rng.uniform(0.0, 5.0)
                img1 = np.clip(batch[0] + stdv * rng.randn(*batch[0].shape),
                               0.0, 255.0).astype(np.float32)
                img2 = np.clip(batch[1] + stdv * rng.randn(*batch[1].shape),
                               0.0, 255.0).astype(np.float32)
                batch = (img1, img2, batch[2], batch[3])
            batch = self.shard_batch(batch)
            state.params, state.opt_state, metrics = self.step_fn(
                state.params, state.opt_state, *batch)
            state.step += 1
            if i == 0:  # surface compile completion + first metrics promptly
                self.log_fn(f"[{state.step:6d}] first step done, loss="
                            f"{float(metrics['loss']):.4f}")
            logger.push(state.step, metrics, batch[0].shape[0],
                        lr=float(self.sched(state.step)))
            if checkpoint_dir and state.step % self.cfg.val_freq == 0:
                self.save(state, checkpoint_dir)
                if orbax_dir:
                    self.save_orbax(state, orbax_dir)
                    self.prune_orbax(orbax_dir, keep=state.step)
                if validate_fn is not None:
                    logger.write_dict(state.step, validate_fn(state.params))
        if checkpoint_dir:
            self.save(state, checkpoint_dir, final=True)
        logger.close()
        return state

    def save(self, state: TrainState, ckpt_dir: str, final: bool = False):
        os.makedirs(ckpt_dir, exist_ok=True)
        name = (f"{self.cfg.name}.npz" if final
                else f"{state.step}_{self.cfg.name}.npz")
        flat = {k: np.asarray(v) for k, v in state.params.items()}
        np.savez(os.path.join(ckpt_dir, name), __step__=state.step, **flat)

    @staticmethod
    def load_params(path: str) -> Tuple[Dict, int]:
        data = dict(np.load(path))
        step = int(data.pop("__step__", 0))
        return data, step

    # ---- orbax variants: full train-state (params + optimizer) ---------
    def save_orbax(self, state: TrainState, ckpt_dir: str):
        """Checkpoint params AND optimizer state with orbax (exact resume;
        the reference restarts its optimizer on --restore_ckpt)."""
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{state.step}"))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, {"params": state.params,
                              "opt_state": state.opt_state,
                              "step": state.step})

    @staticmethod
    def latest_orbax_step(ckpt_dir: str) -> Optional[int]:
        """Newest step_N checkpoint under ckpt_dir, or None."""
        if not os.path.isdir(ckpt_dir):
            return None
        steps = [int(d.split("_", 1)[1]) for d in os.listdir(ckpt_dir)
                 if d.startswith("step_") and d.split("_", 1)[1].isdigit()]
        return max(steps) if steps else None

    @staticmethod
    def prune_orbax(ckpt_dir: str, keep: int):
        """Drop orbax step dirs other than `keep` (crash-resume wants only
        the newest full train state; each one is params + 2 Adam moments)."""
        import shutil
        for d in os.listdir(ckpt_dir):
            if (d.startswith("step_") and d.split("_", 1)[1].isdigit()
                    and int(d.split("_", 1)[1]) != keep):
                shutil.rmtree(os.path.join(ckpt_dir, d),
                              ignore_errors=True)

    def restore_orbax(self, ckpt_dir: str, step: int,
                      like: TrainState) -> TrainState:
        """`like` supplies the pytree structure (e.g. init_state(params))
        so optax NamedTuple states restore with their types intact."""
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
        with ocp.StandardCheckpointer() as ckptr:
            tree = ckptr.restore(path, {"params": like.params,
                                        "opt_state": like.opt_state,
                                        "step": like.step})
        return TrainState(params=tree["params"],
                          opt_state=tree["opt_state"],
                          step=int(tree["step"]))
