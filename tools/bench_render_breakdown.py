"""Per-stage breakdown of the dynamic-sample render at KITTI res (pallas
mode): preblock, single pose render, compose+inpaint, full sample. Guides
perf work on the e2e >=5 pairs/s goal. Prints JSON."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, S = 384, 1280, 64


def timed(fn, *args, n=4):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    jax.block_until_ready(out)
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        acc = acc + jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l).astype(jnp.float32), fn(*args),
            jnp.float32(0.0))
    float(acc)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from mpiflow_tpu.geom.camera import make_intrinsics
    from mpiflow_tpu.geom.homography import mpi_plane_disparities
    from mpiflow_tpu.models.geometric import geometric_mpi
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    from mpiflow_tpu.render.mpi import (preblock_mpi,
                                        render_novel_view_preblocked)
    from mpiflow_tpu.ops.inpaint import diffusion_inpaint
    from mpiflow_tpu.ops.pallas_warp import pallas_warp_supported

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    disp = jnp.asarray(
        (np.linspace(0.9, 0.1, H)[:, None] * np.ones((H, W))).astype(
            np.float32))
    mask = jnp.asarray((rng.rand(H, W) > 0.9).astype(np.float32))
    K = jnp.asarray(make_intrinsics(W, H))
    disparities = jnp.asarray(mpi_plane_disparities(S))
    G = jnp.asarray(np.array([[1, 0, 0, .05], [0, 1, 0, .02],
                              [0, 0, 1, -.08], [0, 0, 0, 1]], np.float32))
    mode = "pallas" if pallas_warp_supported() else "preblocked"
    res = {"mode": mode}

    mpi_rgb, mpi_sigma = jax.jit(
        lambda i, d: geometric_mpi(i, d, disparities))(img, disp)

    pre_fn = jax.jit(lambda r, s: preblock_mpi(
        r, s, disparities, K, src_img=img, obj_mask=mask, halo=3,
        pallas=(mode == "pallas")))
    res["preblock_ms"] = round(timed(pre_fn, mpi_rgb, mpi_sigma) * 1e3, 2)
    pre = pre_fn(mpi_rgb, mpi_sigma)

    rend_fn = jax.jit(lambda p, g: render_novel_view_preblocked(
        p, disparities, g, K, K))
    res["one_render_ms"] = round(timed(rend_fn, pre, G) * 1e3, 2)

    inp_fn = jax.jit(lambda f, h: diffusion_inpaint(f, h, num_iters=128))
    frame = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 255)
    holes = jnp.asarray((rng.rand(H, W) > 0.97).astype(np.int32))
    res["inpaint128_ms"] = round(timed(inp_fn, frame, holes) * 1e3, 2)

    full_fn = jax.jit(lambda r, s, g1, g2: render_dynamic_sample(
        r, s, disparities, img, mask, g1, g2, K, K, inpaint_iters=128,
        mode=mode))
    res["full_sample_ms"] = round(
        timed(full_fn, mpi_rgb, mpi_sigma, G, G) * 1e3, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
