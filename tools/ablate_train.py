#!/usr/bin/env python
"""Train-step component ablation: where do the milliseconds go?

VERDICT r3 #3's "done" clause allows either step <= ~550 ms or a per-op
breakdown proving the remaining gathers sit at their issue-rate bound.
XProf traces need a proto toolchain this image lacks, so this measures the
same thing by ablation: time the full jitted train step (batch 4, 288x960,
12 GRU iters, AMP -- the reference recipe) against variants with one
component each replaced by a shape-identical stub:

  * corr_impl in {pallas (fused), xla}    -- the lookup implementations
  * zero_lookup      -- lookup returns zeros (pyramid kept live), so the
                        delta to full_xla IS the lookup's in-context cost
                        (fwd+bwd), overlap included
  * bilinear_upsample-- convex upsample -> 8x bilinear: the delta is the
                        convex-upsample einsum/transpose chain's cost
  * iters=6          -- slope -> per-GRU-iteration marginal cost

Run from the repo root on the chip:  python tools/ablate_train.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, n=3, trials=3):
    import jax.numpy as jnp
    acc = fn()
    float(acc)
    per = []
    for _ in range(trials):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(n):
            acc = acc + fn()
        float(acc)
        per.append((time.perf_counter() - t0) / n)
    return float(np.mean(per)), float(np.std(per))


def main():
    import argparse
    import logging
    logging.basicConfig(level=logging.INFO)   # surface dispatch decisions
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--small", action="store_true",
                    help="RAFT-small (CPU smoke scale)")
    args = ap.parse_args()

    import dataclasses
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()          # MPIFLOW_PLATFORM=cpu for smokes
    import jax
    import jax.numpy as jnp
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from mpiflow_tpu.config import RAFTConfig, TrainConfig
    from mpiflow_tpu.train.raft_train import make_optimizer, make_train_step
    from mpiflow_tpu.cli.train_raft import init_random_params
    from mpiflow_tpu.models import raft as raft_mod

    N, H, W = args.batch, args.height, args.width
    ITERS = args.iters
    base_cfg = (RAFTConfig.small_config() if args.small else RAFTConfig())
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32) * 255)
    flow = jnp.asarray(rng.randn(N, H, W, 2).astype(np.float32))
    valid = jnp.ones((N, H, W), jnp.float32)
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(args.small, 0).items()}

    def build(corr_impl="pallas", iters=None, remat=False, block_up=False):
        tcfg = TrainConfig(num_steps=1000, batch_size=N,
                           iters=ITERS if iters is None else iters,
                           block_up=block_up)
        mcfg = dataclasses.replace(base_cfg, mixed_precision=True,
                                   corr_impl=corr_impl, remat_gru=remat)
        tx, _ = make_optimizer(tcfg)
        step = make_train_step(tcfg, mcfg, tx, donate=False)
        opt_state = tx.init(params)

        def run():
            _, _, m = step(params, opt_state, img1, img2, flow, valid)
            return m["loss"]
        return run

    res = {}

    variants = [("full_pallas", {}), ("full_xla", {"corr_impl": "xla"}),
                ("iters6_pallas", {"iters": max(ITERS // 2, 1)}),
                ("remat_pallas", {"remat": True})]
    if not args.small:   # block-layout sequence loss (TrainConfig.block_up)
        variants.append(("block_up_pallas", {"block_up": True}))
    for name, kw in variants:
        ms, sd = timed(build(**kw))
        res[f"{name}_ms"] = round(ms * 1e3, 1)
        res[f"{name}_sd"] = round(sd * 1e3, 1)

    # zero lookup: stub the XLA lookup, keep the pyramid live -------------
    orig_windowed = raft_mod.corr_lookup_windowed

    def zero_windowed(pyramid, coords, radius):
        Nc, h, w, _ = coords.shape
        K = 2 * radius + 1
        live = sum(jnp.sum(c) for c in pyramid) * 1e-30
        return jnp.zeros((Nc, h, w, len(pyramid) * K * K),
                         jnp.float32) + live

    raft_mod.corr_lookup_windowed = zero_windowed
    try:
        ms, sd = timed(build(corr_impl="xla"))
        res["zero_lookup_ms"] = round(ms * 1e3, 1)
        res["zero_lookup_sd"] = round(sd * 1e3, 1)
    finally:
        raft_mod.corr_lookup_windowed = orig_windowed

    # bilinear instead of convex upsample --------------------------------
    orig_up = raft_mod.upsample_flow_convex
    raft_mod.upsample_flow_convex = (
        lambda f, m: raft_mod.upsample_flow_bilinear(f)
        + 1e-30 * jnp.sum(m))
    try:
        ms, sd = timed(build())
        res["bilinear_upsample_ms"] = round(ms * 1e3, 1)
        res["bilinear_upsample_sd"] = round(sd * 1e3, 1)
    finally:
        raft_mod.upsample_flow_convex = orig_up

    res["lookup_cost_xla_ms"] = round(res["full_xla_ms"]
                                      - res["zero_lookup_ms"], 1)
    res["lookup_cost_pallas_ms"] = round(res["full_pallas_ms"]
                                         - res["zero_lookup_ms"], 1)
    res["convex_upsample_cost_ms"] = round(res["full_pallas_ms"]
                                           - res["bilinear_upsample_ms"], 1)
    d_iters = ITERS - max(ITERS // 2, 1)
    res["per_iter_ms_pallas"] = round(
        (res["full_pallas_ms"] - res["iters6_pallas_ms"]) / max(d_iters, 1),
        1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
