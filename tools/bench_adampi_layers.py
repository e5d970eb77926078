#!/usr/bin/env python
"""Per-layer roofline of the AdaMPI forward at product shape (VERDICT r2 #2).

Times each stage (FMN / encoder / decoder) and each individual conv at its
true (batch=S-folded) shape on the current backend, printing achieved
TFLOP/s and % of v5e bf16 peak, so the optimization targets are measured
rather than guessed. The reference counterparts are the (b*s)-batched
U-Nets in model/CPN/unet.py:32-69 and decoder.py:124-174.

Run from the repo root on the TPU:  python tools/bench_adampi_layers.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, S = 384, 1280, 64
PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBPS = 819.0     # v5e HBM


def _timed(fn, *args, n=3):
    import jax.numpy as jnp
    acc = fn(*args)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(n):
        acc = acc + fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / n


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["stages", "fmn", "dec", "all"],
                    default="all")
    part = ap.parse_args().part

    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from bench import _adampi_params
    from mpiflow_tpu.models.adampi import (adampi_forward, depth_decoder,
                                           feat_mask_network, resnet_encoder)
    from mpiflow_tpu.geom.homography import mpi_plane_disparities

    dt = jnp.bfloat16
    params = _adampi_params()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, H, W), dt)
    disp = jnp.asarray(rng.rand(H, W), dt)
    rgb = img.transpose(1, 2, 0)[None]
    d4 = disp[None, :, :, None]
    disparities = jnp.asarray(mpi_plane_disparities(S))

    def live(x):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(x))

    rows = []

    def report(name, dt_s, tflop, bound_s=None):
        ach = tflop / dt_s
        rows.append((name, dt_s * 1e3, tflop, ach, 100 * ach / PEAK_TFLOPS))
        extra = ""
        if bound_s is not None:
            extra = (f"  | roofline {bound_s * 1e3:6.2f} ms "
                     f"({dt_s / bound_s:5.1f}x off)")
        print(f"{name:34s} {dt_s * 1e3:9.2f} ms  {tflop:7.3f} TFLOP "
              f"{ach:7.1f} TF/s {100 * ach / PEAK_TFLOPS:6.1f}% peak{extra}",
              flush=True)

    # ---- stage level ----------------------------------------------------
    if part in ("stages", "all"):
        full = jax.jit(lambda i, dd: live(adampi_forward(params, i, dd, S,
                                                         plane_chunk=64)[:2]))
        t = _timed(full, img, disp)
        report("adampi_forward (full)", t, _total_tflop())

        fmn = jax.jit(lambda r, dd: live(
            feat_mask_network(params, r, dd, disparities.astype(dt))))
        report("fmn (all planes)", _timed(fmn, rgb, d4), _fmn_tflop())

        enc = jax.jit(lambda r, dd: live(resnet_encoder(params, r, dd)))
        report("encoder (resnet18)", _timed(enc, rgb, d4), _enc_tflop())

        fm_const = jax.nn.softmax(jnp.zeros((S, H, W), dt), axis=0)
        feats = jax.jit(lambda r, dd: resnet_encoder(params, r, dd))(rgb, d4)
        feats = jax.tree_util.tree_map(jnp.asarray, feats)
        dec = jax.jit(lambda f, fm: live(depth_decoder(params, f, fm)[0]))
        report("decoder (all planes)", _timed(dec, feats, fm_const),
               _dec_tflop())
        if part == "stages":
            return

    # ---- individual convs at true shapes --------------------------------
    # Timed as ONE dispatch scanning NREP iterations: the chained-
    # accumulator pattern pays ~a tunnel round-trip per measurement
    # (tools/bench_overhead.py: +7-9 ms at n=3), which swamps 10-20 ms
    # programs. The weight (small) is perturbed per iteration to defeat
    # CSE; the sum fuses into the conv epilogue, so the output write-back
    # is not measured (negligible next to the window reads at these C).
    from mpiflow_tpu.models.nn import conv2d

    NREP = 10

    def conv_at(name, cin, cout, hh, ww, batch, stride=1):
        w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dt)
        x = jnp.asarray(rng.rand(batch, hh, ww, cin), dt)

        @jax.jit
        def rep(xx):
            def body(acc, _):
                y = conv2d(xx, w + acc * 1e-20, stride=stride, padding=1)
                return acc + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NREP)
            return acc

        float(rep(x))
        t0 = time.perf_counter()
        float(rep(x))
        dt_s = (time.perf_counter() - t0) / NREP
        oh, ow = hh // stride, ww // stride
        tf = 2 * 9 * cin * cout * oh * ow * batch / 1e12
        # intensity roofline: max(MXU time, HBM time for in+out streams)
        hbm_bytes = 2 * batch * (hh * ww * cin + oh * ow * cout)
        bound_s = max(tf / PEAK_TFLOPS, hbm_bytes / HBM_GBPS / 1e9)
        report(name, dt_s, tf, bound_s)

    if part == "dec":
        pass
    else:
        print("\n-- FMN convs (batch = 64 planes) --", flush=True)
        _fmn_convs(conv_at)
    if part in ("dec", "all"):
        print("\n-- decoder gated convs (x2: conv+mask) --", flush=True)
        _dec_convs(conv_at)

    total_conv_ms = sum(r[1] for r in rows[4:])
    print(f"\nsum of individual convs: {total_conv_ms:.1f} ms "
          f"(decoder gated convs count once; x2 for conv+mask pairs)")


def _fmn_convs(conv_at):
    conv_at("fmn.conv1 5->16 @full", 5, 16, H, W, S)
    conv_at("fmn.conv2 16->32 /2", 16, 32, H, W, S, stride=2)
    conv_at("fmn.conv3 32->64 /2", 32, 64, H // 2, W // 2, S, stride=2)
    conv_at("fmn.conv4 64->128 /2", 64, 128, H // 4, W // 4, S, stride=2)
    conv_at("fmn.conv5 128->128", 128, 128, H // 8, W // 8, S)
    conv_at("fmn.conv6 192->64 @1/4", 192, 64, H // 4, W // 4, S)
    conv_at("fmn.conv7 96->32 @1/2", 96, 32, H // 2, W // 2, S)
    conv_at("fmn.conv8 48->16 @full", 48, 16, H, W, S)
    conv_at("fmn.conv9 16->1 @full", 16, 1, H, W, S)


def _dec_convs(conv_at):
    conv_at("dec.up40 514->192 @1/16", 514, 192, H // 16, W // 16, S)
    conv_at("dec.up41 450->192 @1/16", 450, 192, H // 16, W // 16, S)
    conv_at("dec.up30 192->96 @1/8", 192, 96, H // 8, W // 8, S)
    conv_at("dec.up31 226->96 @1/8", 226, 96, H // 8, W // 8, S)
    conv_at("dec.up20 96->48 @1/4", 96, 48, H // 4, W // 4, S)
    conv_at("dec.up21 114->48 @1/4", 114, 48, H // 4, W // 4, S)
    conv_at("dec.up10 48->24 @1/2", 48, 24, H // 2, W // 2, S)
    conv_at("dec.up11 90->24 @1/2", 90, 24, H // 2, W // 2, S)
    conv_at("dec.up00 24->12 @full", 24, 12, H, W, S)
    conv_at("dec.up01 12->12 @full", 12, 12, H, W, S)
    conv_at("dec.disp0 12->4 @full", 12, 4, H, W, S)


def _fmn_tflop():
    hw = H * W
    macs = (45 * 16 + 9 * 16 * 32 / 4 + 9 * 32 * 64 / 16 + 9 * 64 * 128 / 64
            + 9 * 128 * 128 / 64 + 9 * 192 * 64 / 16 + 9 * 96 * 32 / 4
            + 9 * 48 * 16 + 9 * 16 * 1) * hw * S
    return 2 * macs / 1e12


def _enc_tflop():
    # resnet-18, single image; rough (stem + 4 stages x 2 blocks)
    hw = H * W
    macs = (49 * 4 * 64 * hw / 4
            + 2 * 2 * 9 * 64 * 64 * hw / 16
            + (9 * 64 * 128 + 9 * 128 * 128 * 3 + 64 * 128) * hw / 64
            + (9 * 128 * 256 + 9 * 256 * 256 * 3 + 128 * 256) * hw / 256
            + (9 * 256 * 512 + 9 * 512 * 512 * 3 + 256 * 512) * hw / 1024)
    return 2 * macs / 1e12


def _dec_tflop():
    hw = H * W
    per_plane = (2 * (9 * 514 * 192 / 256 + 9 * 450 * 192 / 256
                      + 9 * 192 * 96 / 64 + 9 * 226 * 96 / 64
                      + 9 * 96 * 48 / 16 + 9 * 114 * 48 / 16
                      + 9 * 48 * 24 / 4 + 9 * 90 * 24 / 4
                      + 9 * 24 * 12 + 9 * 12 * 12
                      + 9 * 12 * 4 + 9 * 24 * 4 / 4 + 9 * 48 * 4 / 16
                      + 9 * 96 * 4 / 64))
    return 2 * per_plane * hw * S / 1e12


def _total_tflop():
    return _fmn_tflop() + _enc_tflop() + _dec_tflop()


if __name__ == "__main__":
    main()
