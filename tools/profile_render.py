#!/usr/bin/env python
"""On-chip breakdown of the fused renderer: isolates the gather, the
source-side chain, and the compositing math. Timing forces a scalar fetch
(the axon tunnel's block_until_ready is unreliable); subtract the printed
round-trip floor from everything.

Usage: python tools/profile_render.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpiflow_tpu.utils.platform import enable_compile_cache
enable_compile_cache()

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpiflow_tpu.geom.camera import make_intrinsics
from mpiflow_tpu.geom.homography import (mpi_plane_disparities,
                                         pixel_grid_homo, plane_homographies)
from mpiflow_tpu.models.geometric import geometric_mpi
from mpiflow_tpu.render.mpi import render_novel_view
from mpiflow_tpu.ops.resample import blocked_source, bilinear_sample_blocked

H, W, S = 384, 1280, 64


def bench(name, f, *a, n=4):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(*a))
    print(f"{name:38s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, H, W), jnp.float32)
    disp = jnp.asarray(0.2 + 0.6 * rng.rand(H, W), jnp.float32)
    mask = jnp.zeros((H, W)).at[100:260, 400:800].set(1.0)
    K = jnp.asarray(make_intrinsics(W, H))
    dsp = jnp.asarray(mpi_plane_disparities(S))
    G = jnp.eye(4).at[0, 3].set(0.1).at[2, 3].set(-0.15)
    grid = jnp.asarray(pixel_grid_homo(H, W))

    mpi_rgb, mpi_sigma = jax.jit(lambda i, d: geometric_mpi(i, d, dsp))(img, disp)

    @jax.jit
    def trivial(x):
        return (x * 2).sum()
    bench("round-trip floor", trivial, img)

    @jax.jit
    def full(r, s, i, m):
        return render_novel_view(r, s, dsp, G, K, K, src_img=i,
                                 obj_mask=m, mode="scan").frame.sum()
    bench("full scan render", full, mpi_rgb, mpi_sigma, img, mask)

    # gather-only scan: same blocked build + gather per plane, no compositing
    @jax.jit
    def gather_only(r, s, m):
        _, H_st = plane_homographies(G, K, K, 1.0 / dsp)
        gf = grid.reshape(3, -1)

        def step(acc, xs):
            H_st_s, rgb_s, sigma_s = xs
            sh = jnp.matmul(H_st_s, gf, precision=jax.lax.Precision.HIGHEST)
            coords = (sh[0:2] / sh[2:3]).reshape(2, H, W).transpose(1, 2, 0)
            stack = jnp.concatenate([rgb_s, sigma_s, m[None]], axis=0)
            w5 = bilinear_sample_blocked(blocked_source(stack), 5, H, W,
                                         coords)
            return acc + w5.sum(), None

        acc, _ = jax.lax.scan(step, 0.0, (H_st, r, s))
        return acc
    bench("gather-only scan (blk build+gthr)", gather_only, mpi_rgb,
          mpi_sigma, mask)

    # blocked-build-only scan (no gather)
    @jax.jit
    def build_only(r, s, m):
        def step(acc, xs):
            rgb_s, sigma_s = xs
            stack = jnp.concatenate([rgb_s, sigma_s, m[None]], axis=0)
            return acc + blocked_source(stack).sum(), None
        acc, _ = jax.lax.scan(step, 0.0, (r, s))
        return acc
    bench("blocked-build-only scan", build_only, mpi_rgb, mpi_sigma, mask)


if __name__ == "__main__":
    main()
