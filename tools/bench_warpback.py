#!/usr/bin/env python
"""Warpback stage-2 synthesis throughput on the current backend (VERDICT r2
#8): the full batched (mesh-render -> canny -> EdgeConnect trio -> merge)
chain as one jitted program, at the reference's stage-2 training shape
(stage2_dataset.py:37-44: 384x256).

The reference runs this chain per-sample inside the DataLoader collate on
GPU (stage2_dataset.py:145-175); the TPU path batches the whole synthesis.
EdgeConnect weights are random at the published layouts (the .pth files are
stripped from the snapshot); throughput depends only on the compute graph.

Run from the repo root:  python tools/bench_warpback.py [--batch 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mpiflow_tpu.warpback.datasets import (
        DEFAULT_TRANS_RANGE, make_stage2_synthesizer,
        random_edgeconnect_params, sample_warpback_pose)

    B, H, W = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32))
    disp = jnp.asarray((0.1 + 0.8 * rng.rand(B, H, W)).astype(np.float32))
    ext = jnp.asarray(np.stack([
        sample_warpback_pose(rng, DEFAULT_TRANS_RANGE)[0]
        for _ in range(B)]))

    ec = random_edgeconnect_params()
    synth = make_stage2_synthesizer(ec)

    # chain a scalar through iterations and fetch it: block_until_ready is
    # unreliable over the axon tunnel (see bench.py _timed)
    def run_once(r):
        out = synth(r, disp, ext)
        return jnp.sum(out["src_rgb"]) * 1e-6

    run = jax.jit(run_once)
    acc = run(rgb)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(args.iters):
        acc = acc + run(rgb + acc * 1e-20)
    float(acc)
    dt = (time.perf_counter() - t0) / args.iters

    pairs_s = B / dt
    print(f"stage2 synthesis {W}x{H} batch={B}: {dt * 1e3:.1f} ms/batch = "
          f"{pairs_s:.2f} pairs/s "
          f"({dt / B * 1e3:.1f} ms/pair) on {jax.default_backend()}")

    # per-stage split: render-only vs inpaint-only
    from mpiflow_tpu.warpback.datasets import K_NORM, inpaint_rgbd_batch
    from mpiflow_tpu.warpback.renderer import rgbd_render
    K = jnp.asarray(K_NORM)
    render = jax.jit(lambda r: sum(
        jnp.sum(o) * 1e-6 for o in jax.vmap(
            lambda rr, d, e: rgbd_render(rr, d, K, e))(r, disp, ext)))
    wr, wd, wm = jax.jit(jax.vmap(
        lambda rr, d, e: rgbd_render(rr, d, K, e)))(rgb, disp, ext)
    inpaint = jax.jit(lambda r: sum(
        jnp.sum(o) * 1e-6
        for o in inpaint_rgbd_batch(ec, r, wd, wm)))
    for name, fn, x in (("render", render, rgb), ("inpaint", inpaint, wr)):
        acc = fn(x)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(args.iters):
            acc = acc + fn(x + acc * 1e-20)
        float(acc)
        d = (time.perf_counter() - t0) / args.iters
        print(f"  {name:8s} {d * 1e3:7.1f} ms/batch "
              f"({B / d:6.2f} pairs/s)")


if __name__ == "__main__":
    main()
