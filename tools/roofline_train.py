#!/usr/bin/env python
"""RAFT train-step roofline: XLA-counted FLOPs vs the measured step time.

Complements tools/roofline_warp.py (the generator's hot kernel) with the
consumer's: the full jitted train step (forward + backward + AdamW) at the
reference recipe (RAFT/train.py + train_standard.sh: batch 4, 288x960 crop,
12 GRU iters, AMP) is lowered and costed with XLA's HLO cost analysis --
no hardware needed; FLOPs are a property of the graph -- and compared
against the measured on-chip step time recorded in docs/ARCHITECTURE.md.

MFU here follows the usual convention: model-graph FLOPs only. The count
uses corr_impl="xla" so the correlation lookup is gathers; the Pallas
kernel's one-hot MXU matmuls do MORE raw flops for LESS time (that is the
trick: trading VPU-hostile gathers for MXU work), so its overhead flops are
deliberately excluded from the numerator.

Run from the repo root:  python tools/roofline_train.py [--measured_ms 653]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e (TPU v5 lite) single-chip peaks, from the public spec sheet
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured_ms", type=float, default=653.0,
                    help="measured on-chip step time (docs/ARCHITECTURE.md)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mpiflow_tpu.config import RAFTConfig, TrainConfig
    from mpiflow_tpu.train.raft_train import Trainer
    from mpiflow_tpu.cli.train_raft import init_random_params

    B, H, W = args.batch, args.height, args.width
    train_cfg = TrainConfig(name="roofline", stage="mpiflow",
                            batch_size=B, image_size=(H, W),
                            iters=args.iters, num_steps=100)
    model_cfg = RAFTConfig(mixed_precision=True, corr_impl="xla")
    trainer = Trainer(train_cfg, model_cfg)
    trainer.model_cfg = model_cfg  # keep the xla count (see module docstring)

    params = init_random_params(small=False, seed=0)
    state = trainer.init_state(params)

    img = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
    flow = jax.ShapeDtypeStruct((B, H, W, 2), jnp.float32)
    valid = jax.ShapeDtypeStruct((B, H, W), jnp.float32)
    from mpiflow_tpu.train.raft_train import make_train_step
    step = make_train_step(train_cfg, model_cfg, trainer.tx, donate=False)
    lowered = step.lower(state.params, state.opt_state, img, img, flow, valid)
    cost = lowered.cost_analysis()
    flops = float(cost["flops"])
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    dt = args.measured_ms / 1e3
    achieved_tflops = flops / dt / 1e12
    mfu = achieved_tflops / V5E_BF16_TFLOPS
    # bytes-accessed on unoptimized HLO wildly overcounts (pre-fusion every
    # intermediate round-trips); report it as the no-fusion bound only
    nofusion_hbm_s = bytes_accessed / (V5E_HBM_GBPS * 1e9)

    print(f"train step {W}x{H} batch={B} iters={args.iters} (full RAFT, AMP)")
    print(f"  XLA-counted FLOPs/step:    {flops / 1e12:.3f} TFLOP")
    print(f"  measured step time:        {args.measured_ms:.0f} ms "
          f"(docs/ARCHITECTURE.md, v5e)")
    print(f"  achieved:                  {achieved_tflops:.2f} TFLOP/s")
    print(f"  MFU vs v5e bf16 peak:      {100 * mfu:.1f}%")
    print(f"  pre-fusion bytes accessed: {bytes_accessed / 1e9:.1f} GB "
          f"(= {nofusion_hbm_s * 1e3:.0f} ms at HBM peak if XLA fused "
          f"nothing)")
    per_img_ms = args.measured_ms / B
    print(f"  per-image: {per_img_ms:.0f} ms = {1e3 / per_img_ms:.2f} "
          f"img/s/chip")


if __name__ == "__main__":
    main()
