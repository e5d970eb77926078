"""A/B the warp-table dtype (f32 vs bf16) on the full 5-repeat dynamic
render at KITTI res, plus accuracy deltas. Prints JSON."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, S, R = 384, 1280, 64, 5


def timed(fn, *a, n=4):
    import jax
    import jax.numpy as jnp

    def live(o):
        return sum(jnp.sum(l).astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(o)
                   if hasattr(l, "dtype"))

    float(live(fn(*a)))
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(n):
        acc = acc + live(fn(*a))
    float(acc)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from mpiflow_tpu.geom.camera import make_intrinsics
    from mpiflow_tpu.geom.homography import mpi_plane_disparities
    from mpiflow_tpu.models.geometric import geometric_mpi
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    from mpiflow_tpu.ops.pallas_warp import pallas_warp_supported

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    disp = jnp.asarray((np.linspace(.9, .1, H)[:, None]
                        * np.ones((H, W))).astype(np.float32))
    mask = jnp.asarray((rng.rand(H, W) > 0.9).astype(np.float32))
    K = jnp.asarray(make_intrinsics(W, H))
    disparities = jnp.asarray(mpi_plane_disparities(S))
    G = jnp.asarray(np.array([[1, 0, 0, .05], [0, 1, 0, .02],
                              [0, 0, 1, -.08], [0, 0, 0, 1]], np.float32))
    Gs = jnp.broadcast_to(G[None], (R, 4, 4)) + 0.0
    res = {"f32_probe": pallas_warp_supported(),
           "bf16_probe": pallas_warp_supported(dtype=jnp.bfloat16)}
    mode = "pallas" if res["f32_probe"] else "preblocked"
    res["mode"] = mode
    mpi_rgb, mpi_sigma = jax.jit(
        lambda i, d: geometric_mpi(i, d, disparities))(img, disp)

    outs = {}
    for name, wd in (("f32", None), ("bf16", jnp.bfloat16)):
        @jax.jit
        def five(r, s, gs):
            def one(g):
                return render_dynamic_sample(
                    r, s, disparities, img, mask, g, g, K, K,
                    inpaint_iters=128, mode=mode, warp_dtype=wd)
            return jax.lax.map(one, gs)
        res[f"five_{name}_ms"] = round(
            timed(five, mpi_rgb, mpi_sigma, Gs) * 1e3, 1)
        outs[name] = jax.tree_util.tree_map(
            np.asarray, five(mpi_rgb, mpi_sigma, Gs))

    a, b = outs["f32"], outs["bf16"]
    res["flow_max_diff"] = float(np.abs(a.flow - b.flow).max())
    res["dst_u8_max_diff"] = int(np.abs(
        a.dst_u8.astype(int) - b.dst_u8.astype(int)).max())
    res["dst_u8_mean_diff"] = float(np.abs(
        a.dst_u8.astype(float) - b.dst_u8.astype(float)).mean())
    res["holes_frac_diff"] = float((a.holes != b.holes).mean())
    print(json.dumps(res))


if __name__ == "__main__":
    main()
