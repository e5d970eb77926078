#!/usr/bin/env python
"""Convex-upsample microbench: where do its 167 ms in the train step go?

logs/ablate_train_r5.log puts the convex-upsample chain (12 iterations,
fwd+bwd, batch 4 at 288x960) at 167.6 ms of the 491.4 ms step -- ~1/3 of
the step for an op that moves <100 MB/iter. Suspects: the post-einsum
depth-to-space transpose ([N,h,w,8,8,2] -> [N,h,8,w,8,2], materialized
fwd AND bwd, x12) and the strided softmax axis.

Variants (all numerically cross-checked before timing):
  current       models/raft.py upsample_flow_convex + pixel-layout L1
  einsum_direct einsum emits nhawbc directly; the final reshape merges
                adjacent dims (free); no explicit transpose op
  block         predictions STAY in block layout [N,h,w,64,2]; the ground
                truth is space-to-depth'd ONCE outside the grad. The L1
                sum is over identical per-pixel terms, so loss and grads
                match to fp-reassociation tolerance. This is the "never
                relayout" ceiling for the train step (reference analog:
                RAFT/train.py:47-72 computes the loss in pixel layout
                because torch's unfold already materialized it).

Timing: grad wrt (flow12, mask12) of a gamma-weighted 12-prediction L1 --
the exact shape of the upsample's contribution to sequence_loss.

Run from the repo root on the chip:  python tools/bench_upsample.py
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    from mpiflow_tpu.models.raft import upsample_flow_convex

    _HI = jax.lax.Precision.HIGHEST
    N, H8, W8, T = args.batch, args.height, args.width, args.iters
    h, w = H8 // 8, W8 // 8
    rng = np.random.RandomState(0)
    flow12 = jnp.asarray(rng.randn(T, N, h, w, 2).astype(np.float32))
    mask12 = jnp.asarray(rng.randn(T, N, h, w, 576).astype(np.float32))
    gt = jnp.asarray(rng.randn(N, H8, W8, 2).astype(np.float32) * 10)
    gamma = 0.8 ** jnp.arange(T - 1, -1, -1, dtype=jnp.float32)

    # gt in block layout [N,h,w,64,2]: inverse of the upsample's d2s
    gt_blk = gt.reshape(N, h, 8, w, 8, 2).transpose(0, 1, 3, 2, 4, 5)
    gt_blk = gt_blk.reshape(N, h, w, 64, 2)

    def up_einsum_direct(flow, mask):
        n, hh, ww, _ = flow.shape
        m = jax.nn.softmax(mask.reshape(n, hh, ww, 9, 8, 8), axis=3)
        fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
        nbrs = jnp.stack([fp[:, dy:dy + hh, dx:dx + ww] for dy in range(3)
                          for dx in range(3)], axis=3)
        up = jnp.einsum("nhwkab,nhwkc->nhawbc", m, nbrs, precision=_HI)
        return up.reshape(n, 8 * hh, 8 * ww, 2)

    def up_block(flow, mask):
        n, hh, ww, _ = flow.shape
        m = jax.nn.softmax(mask.reshape(n, hh, ww, 9, 64), axis=3)
        fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
        nbrs = jnp.stack([fp[:, dy:dy + hh, dx:dx + ww] for dy in range(3)
                          for dx in range(3)], axis=3)
        return jnp.einsum("nhwkq,nhwkc->nhwqc", m, nbrs,
                          precision=_HI)                    # [N,h,w,64,2]

    def seq_loss(up_fn, target):
        def loss(f12, m12):
            def body(i, acc):
                up = up_fn(f12[i], m12[i])
                return acc + gamma[i] * jnp.abs(up - target).mean()
            return jax.lax.fori_loop(0, T, body, jnp.float32(0.0))
        return loss

    variants = {
        "current": seq_loss(upsample_flow_convex, gt),
        "einsum_direct": seq_loss(up_einsum_direct, gt),
        "block": seq_loss(up_block, gt_blk),
    }

    # numeric cross-check (loss + grads) before timing
    ref_l, ref_g = jax.value_and_grad(variants["current"], (0, 1))(
        flow12, mask12)
    for name, fn in variants.items():
        l, g = jax.value_and_grad(fn, (0, 1))(flow12, mask12)
        dl = abs(float(l) - float(ref_l)) / abs(float(ref_l))
        dg = max(float(jnp.abs(a - b).max())
                 for a, b in zip(g, ref_g))
        assert dl < 1e-5 and dg < 1e-4, (name, dl, dg)
        print(f"parity {name}: dloss={dl:.2e} dgrad={dg:.2e}", flush=True)

    results = {}
    for name, fn in variants.items():
        vg = jax.jit(jax.value_and_grad(fn, (0, 1)))

        def run(vg=vg):
            l, (gf, gm) = vg(flow12, mask12)
            return l + gf.sum() + gm.sum()

        ms, sd = timed(run)
        results[f"{name}_ms"] = round(ms * 1000, 1)
        results[f"{name}_sd"] = round(sd * 1000, 1)
        print(json.dumps({name: results[f"{name}_ms"]}), flush=True)

    print(json.dumps(results), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
