#!/usr/bin/env python
"""Microbench of conv-rewrite candidates for the AdaMPI forward (VERDICT r2
#2 follow-up).

The per-conv roofline (bench_adampi_layers.py) shows every AdaMPI conv far
below MXU peak (1-11%), including 128->128 shapes whose padded-tile ceiling
is ~100%. This isolates WHERE the loss is by comparing, per representative
shape:

  * conv      : lax.conv_general_dilated as the model uses it
  * matmul    : the same contraction as one dot ([M,9C] @ [9C,N]) on a
                PRE-MATERIALIZED im2col operand -- the MXU ceiling for the
                contraction, ignoring window-formation cost
  * shift9    : 9 shifted [M,C] @ [C,N] matmuls accumulated in f32 --
                window formation as strided HBM reads instead of conv
                lowering
  * s2d       : space-to-depth repack (2x2 or 4x4 block -> channels), conv
                in block space with an equivalently re-laid-out kernel.
                Only the repack cost differs semantically; we time the
                repacked conv on pre-packed operands plus the repack.

Run from the repo root: python tools/bench_conv_tricks.py [--part a|b]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, S = 384, 1280, 64
PEAK = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all", choices=["a", "b", "all"])
    part = ap.parse_args().part

    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    def timed(fn, *args, n=3):
        acc = fn(*args)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(n):
            acc = acc + fn(*args)
        float(acc)
        return (time.perf_counter() - t0) / n

    def report(name, dt_s, tflop):
        ach = tflop / dt_s
        print(f"{name:38s} {dt_s * 1e3:8.2f} ms {ach:7.1f} TF/s "
              f"{100 * ach / PEAK:6.1f}% peak", flush=True)

    def conv_direct(x, w, stride=1, pad=None):
        kh, kw = w.shape[0], w.shape[1]
        if pad is None:  # 'same'-style for odd kernels, (0,k-1) for even
            pad = ((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2))
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bench_shape(tag, cin, cout, hh, ww, stride=1):
        w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dt)
        x = jnp.asarray(rng.rand(S, hh, ww, cin), dt)
        tf = 2 * 9 * cin * cout * (hh // stride) * (ww // stride) * S / 1e12

        f = jax.jit(lambda xx: jnp.sum(
            conv_direct(xx, w, stride).astype(jnp.float32)))
        report(f"{tag} conv", timed(f, x), tf)

        # --- im2col matmul ceiling (operand pre-materialized) -----------
        M = S * (hh // stride) * (ww // stride)
        a = jnp.asarray(rng.rand(M, 9 * cin), dt)
        wm = w.reshape(9 * cin, cout)
        g = jax.jit(lambda aa: jnp.sum(
            jax.lax.dot_general(aa, wm, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)))
        report(f"{tag} matmul[{M}x{9 * cin}]@[{9 * cin}x{cout}]",
               timed(g, a), tf)

        # --- 9 shifted matmuls ------------------------------------------
        def shift9(xx):
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = None
            for dy in range(3):
                for dx in range(3):
                    sl = xp[:, dy:dy + hh:stride, dx:dx + ww:stride]
                    t = jax.lax.dot_general(
                        sl.reshape(-1, cin), w[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out = t if out is None else out + t
            return jnp.sum(out)

        report(f"{tag} shift9", timed(jax.jit(shift9), x), tf)

    if part in ("a", "all"):
        bench_shape("c5 128->128 @1/8", 128, 128, H // 8, W // 8)
        bench_shape("c6 192->64 @1/4", 192, 64, H // 4, W // 4)
        bench_shape("c2 16->32 /2 @full", 16, 32, H, W, stride=2)
        bench_shape("c8 48->16 @full", 48, 16, H, W)

    if part not in ("b", "all"):
        return

    # --- s2d(4) for the stride-1 full-res 48->16 (fmn.conv8) -------------
    # x [S,H,W,48] -> xb [S,H/4,W/4,768]; kernel 3x3 block-space
    # [3,3,768,256] built so that output block (16 phases x 16ch) equals
    # the direct conv's d2s -- here we only measure SPEED of the block
    # conv + repacks (the kernel rewrite is a fixed permutation with 9/36
    # tap density).
    cin, cout, B = 48, 16, 4
    x = jnp.asarray(rng.rand(S, H, W, cin), dt)
    wb = jnp.asarray(rng.randn(3, 3, cin * B * B, cout * B * B) * 0.05, dt)
    tf = 2 * 9 * cin * cout * H * W * S / 1e12

    def s2d_conv(xx):
        xb = xx.reshape(S, H // B, B, W // B, B, cin) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(S, H // B, W // B, -1)
        yb = conv_direct(xb, wb)
        y = yb.reshape(S, H // B, W // B, B, B, cout) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(S, H, W, cout)
        return jnp.sum(y.astype(jnp.float32))

    report("c8 s2d(4) block conv 768->256", timed(jax.jit(s2d_conv), x), tf)

    # --- s2d(4) for the stride-2 16->32 (fmn.conv2): output s2d(2) -------
    cin, cout = 16, 32
    x = jnp.asarray(rng.rand(S, H, W, cin), dt)
    w2 = jnp.asarray(rng.randn(2, 2, cin * 16, cout * 4) * 0.05, dt)
    tf = 2 * 9 * cin * cout * (H // 2) * (W // 2) * S / 1e12

    def s2d_conv2(xx):
        xb = xx.reshape(S, H // 4, 4, W // 4, 4, cin) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(S, H // 4, W // 4, -1)
        yb = conv_direct(xb, w2)  # [S,H/4,W/4,128]
        y = yb.reshape(S, H // 4, W // 4, 2, 2, cout) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(S, H // 2, W // 2, cout)
        return jnp.sum(y.astype(jnp.float32))

    report("c2 s2d(4->2) block conv 256->128",
           timed(jax.jit(s2d_conv2), x), tf)


if __name__ == "__main__":
    main()
