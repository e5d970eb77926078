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

    # sub-parts: the [S,5,H,W] stack -> blocked-table transform alone
    from mpiflow_tpu.ops.pallas_warp import table_from_image
    from mpiflow_tpu.ops.resample import blocked_source
    stack = jnp.concatenate(
        [mpi_rgb, mpi_sigma,
         jnp.broadcast_to(mask[None, None], (S, 1, H, W))], axis=1)
    tbl_fn = jax.jit(lambda st: jax.vmap(table_from_image)(st))
    res["table_build_ms"] = round(timed(tbl_fn, stack) * 1e3, 2)
    blk_fn = jax.jit(lambda st: jax.vmap(
        lambda s: blocked_source(s, 3))(st))
    res["blocked_build_ms"] = round(timed(blk_fn, stack) * 1e3, 2)

    # reshape-based table build (candidate replacement)
    def table_fast(im):
        C2, H2, W2 = im.shape
        Hb, Wb = (H2 + 1) // 2, (W2 + 1) // 2
        pad = jnp.pad(im, ((0, 0), (0, 2*Hb + 2 - H2),
                           (0, 2*Wb + 2 - W2)), mode="edge")
        r01 = pad[:, :2*Hb].reshape(C2, Hb, 2, 2*Wb + 2)
        r2 = pad[:, 2:2*Hb + 2].reshape(C2, Hb, 2, 2*Wb + 2)[:, :, 0]
        taps = []
        for R in (r01[:, :, 0], r01[:, :, 1], r2):
            c01 = R[..., :2*Wb].reshape(C2, Hb, Wb, 2)
            c2c = R[..., 2:2*Wb + 2].reshape(C2, Hb, Wb, 2)[..., 0]
            taps += [c01[..., 0], c01[..., 1], c2c]
        return jnp.concatenate(taps, axis=0)

    tblf_fn = jax.jit(lambda st: jax.vmap(table_fast)(st))
    res["table_fast_ms"] = round(timed(tblf_fn, stack) * 1e3, 2)
    res["table_fast_exact"] = bool(
        (np.asarray(tbl_fn(stack)) == np.asarray(tblf_fn(stack))).all())

    # preblock minus table: the blend / w_src / stack math alone
    from mpiflow_tpu.geom.homography import pixel_grid_homo
    from mpiflow_tpu.geom.camera import intrinsics_inverse
    _HI = jax.lax.Precision.HIGHEST

    @jax.jit
    def stack_math(mpi_rgb, mpi_sigma):
        grid = jnp.asarray(pixel_grid_homo(H, W), jnp.float32)
        rays = jnp.matmul(intrinsics_inverse(K), grid.reshape(3, -1),
                          precision=_HI)
        ray_norm = jnp.linalg.norm(rays, axis=0).reshape(H, W)
        depths = 1.0 / disparities
        dist_src = jnp.concatenate(
            [(depths[1:] - depths[:-1])[:, None, None] * ray_norm[None],
             jnp.full((1, H, W), 1e3, jnp.float32)], axis=0)
        T_src = jnp.exp(-mpi_sigma[:, 0] * dist_src)
        T_acc = jnp.cumprod(T_src + 1e-6, axis=0)
        T_acc = jnp.concatenate([jnp.ones((1, H, W)), T_acc[:-1]], axis=0)
        w_src = T_acc * (1.0 - T_src)
        rgb = T_acc[:, None] * img[None] + (1 - T_acc[:, None]) * mpi_rgb
        st = jnp.concatenate(
            [rgb, mpi_sigma,
             jnp.broadcast_to(mask[None, None], (S, 1, H, W))], axis=1)
        return st, w_src

    res["stack_math_ms"] = round(timed(stack_math, mpi_rgb, mpi_sigma)
                                 * 1e3, 2)

    # hypothesis: preblock_ms >> stack+table because XLA fuses the blend
    # math into the 9 strided tap reads (recomputing it 9x); a barrier
    # between stack and table should recover stack+table
    @jax.jit
    def preblock_barrier(r, s):
        st, w_src = stack_math(r, s)
        st = jax.lax.optimization_barrier(st)
        return jax.vmap(table_from_image)(st), w_src

    res["preblock_barrier_ms"] = round(
        timed(preblock_barrier, mpi_rgb, mpi_sigma) * 1e3, 2)

    from mpiflow_tpu.render.mpi import PreblockedMPI

    @jax.jit
    def rend_fn(blocked, w_src, sigma, g):
        p = PreblockedMPI(blocked=blocked, w_src=w_src, mpi_sigma=sigma,
                          height=H, width=W, halo=int(pre.halo),
                          pallas=bool(pre.pallas))
        return render_novel_view_preblocked(p, disparities, g, K, K)

    res["one_render_ms"] = round(
        timed(rend_fn, pre.blocked, pre.w_src, pre.mpi_sigma, G) * 1e3, 2)

    inp_fn = jax.jit(lambda f, h: diffusion_inpaint(f, h, num_iters=128))
    frame = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 255)
    holes = jnp.asarray((rng.rand(H, W) > 0.97).astype(np.int32))
    res["inpaint128_ms"] = round(timed(inp_fn, frame, holes) * 1e3, 2)

    full_fn = jax.jit(lambda r, s, g1, g2: render_dynamic_sample(
        r, s, disparities, img, mask, g1, g2, K, K, inpaint_iters=128,
        mode=mode))
    res["full_sample_ms"] = round(
        timed(full_fn, mpi_rgb, mpi_sigma, G, G) * 1e3, 2)

    # 5 repeats, current structure (per-repeat preblock, as bench.py runs)
    Gs = jnp.broadcast_to(G[None], (5, 4, 4)) + 0.0

    @jax.jit
    def five_current(r, s, gs):
        def one(g):
            return render_dynamic_sample(r, s, disparities, img, mask,
                                         g, g, K, K, inpaint_iters=128,
                                         mode=mode)
        return jax.lax.map(one, gs)

    res["five_current_ms"] = round(timed(five_current, mpi_rgb, mpi_sigma,
                                         Gs) * 1e3, 2)

    # 5 repeats sharing ONE preblock (upper bound for the mask-split
    # restructure: semantics only valid when the obj mask is fixed)
    from mpiflow_tpu.render.dynamic import compose_dynamic_pair, _to_u8f
    from mpiflow_tpu.ops.inpaint import diffusion_inpaint as dinp

    @jax.jit
    def five_shared(r, s, gs):
        p = preblock_mpi(r, s, disparities, K, src_img=img, obj_mask=mask,
                         halo=3, pallas=(mode == "pallas"))

        def one(g):
            ro = render_novel_view_preblocked(p, disparities, g, K, K)
            rc = render_novel_view_preblocked(p, disparities, g, K, K,
                                              invert_mask=True)
            fl, fr, ho = compose_dynamic_pair(
                ro.frame, ro.obj_mask, ro.flow,
                rc.frame, rc.obj_mask, rc.flow, mask)
            filled = dinp(fr.transpose(1, 2, 0), ho, num_iters=128)
            return fl, filled, ho
        return jax.lax.map(one, gs)

    res["five_shared_preblock_ms"] = round(
        timed(five_shared, mpi_rgb, mpi_sigma, Gs) * 1e3, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
