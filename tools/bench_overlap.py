"""Does XLA overlap the AdaMPI forward (MXU-bound) with the dynamic
renders (gather-bound) when both live in one program? If yes, a 2-image
pipelined program hides most of the per-image AdaMPI cost. Prints JSON."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, S, REPEAT = 384, 1280, 64, 5


def timed(fn, *args, n=3):
    import jax
    import jax.numpy as jnp

    def live(out):
        return sum(jnp.sum(l).astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(out)
                   if hasattr(l, "dtype"))

    float(live(fn(*args)))
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(n):
        acc = acc + live(fn(*args))
    float(acc)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from bench import _adampi_params, make_poses
    from mpiflow_tpu.geom.camera import make_intrinsics
    from mpiflow_tpu.geom.homography import mpi_plane_disparities
    from mpiflow_tpu.models.adampi import adampi_forward
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    from mpiflow_tpu.ops.pallas_warp import pallas_warp_supported

    params = _adampi_params()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    disp = jnp.asarray(
        (np.linspace(0.9, 0.1, H)[:, None] * np.ones((H, W))).astype(
            np.float32))
    mask = jnp.asarray((rng.rand(H, W) > 0.9).astype(np.float32))
    K = jnp.asarray(make_intrinsics(W, H))
    disparities = jnp.asarray(mpi_plane_disparities(S))
    G_obj, G_cam = make_poses(REPEAT)
    Gs = (jnp.asarray(G_obj), jnp.asarray(G_cam))
    mode = "pallas" if pallas_warp_supported() else "preblocked"
    res = {"mode": mode}

    def adampi(im, dp):
        rgb, sigma, _ = adampi_forward(params, im.astype(jnp.bfloat16),
                                       dp.astype(jnp.bfloat16),
                                       num_planes=S, plane_chunk=64)
        return rgb.astype(jnp.float32), sigma.astype(jnp.float32)

    def renders(rgb, sigma, go, gc):
        def one(a):
            return render_dynamic_sample(rgb, sigma, disparities, img, mask,
                                         a[0], a[1], K, K,
                                         inpaint_iters=128, mode=mode)
        return jax.lax.map(one, (go, gc))

    adampi_j = jax.jit(adampi)
    res["adampi_ms"] = round(timed(adampi_j, img, disp) * 1e3, 1)
    rgb, sigma = adampi_j(img, disp)
    renders_j = jax.jit(renders)
    res["renders5_ms"] = round(timed(renders_j, rgb, sigma, *Gs) * 1e3, 1)

    # both in ONE program, independent (image i+1's predict vs image i's
    # renders): can XLA interleave MXU convs with the gather scans?
    @jax.jit
    def fused(im, dp, rgb, sigma, go, gc):
        return adampi(im, dp), renders(rgb, sigma, go, gc)

    res["fused_ms"] = round(
        timed(fused, img, disp, rgb, sigma, *Gs) * 1e3, 1)
    res["serial_sum_ms"] = round(res["adampi_ms"] + res["renders5_ms"], 1)
    res["overlap_frac"] = round(
        (res["serial_sum_ms"] - res["fused_ms"])
        / max(res["adampi_ms"], 1e-9), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
