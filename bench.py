#!/usr/bin/env python
"""Benchmark: image+flow pair generation throughput at KITTI resolution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

`value` is the fused TPU pipeline's throughput: full dynamic-object sample
generation (dual-pose 64-plane MPI render + mask compositing + on-device
inpainting) at 384x1280, per chip.

`vs_baseline` is the speedup over a *reference-dataflow proxy* measured on
the SAME chip: the reference's exact computation structure
(gen_3dphoto_dynamic_v2.py + utils/utils.py) -- B=1, per-plane warped stacks
materialized at (S,8,H,W), separate flow-compositing pass, six full-res
device->host transfers per sample, host numpy mask compositing and host
cv2 (or scipy) inpainting -- re-expressed in JAX. The reference publishes no
throughput numbers (SURVEY.md §6), so the honest baseline is its dataflow on
identical hardware.
"""
import json
import os
import time

import numpy as np

H, W, S, REPEAT = 384, 1280, 64, 5
RENDER_MODE = os.environ.get("MPIFLOW_RENDER_MODE", "pallas")
N_WARMUP, N_ITERS = 1, 4


def _resolve_mode():
    """'pallas' needs backend support (ops/pallas_warp.py probes the Mosaic
    service); otherwise use the XLA blocked-gather renderer."""
    if RENDER_MODE != "pallas":
        return RENDER_MODE
    from mpiflow_tpu.ops.pallas_warp import (pallas_warp_supported,
                                             supported_shape)
    if supported_shape(H, W) and pallas_warp_supported():
        return "pallas"
    return "preblocked"


def make_inputs(rng):
    import jax.numpy as jnp
    img = jnp.asarray(rng.rand(3, H, W), jnp.float32)
    disp = jnp.asarray(
        0.2 + 0.7 * rng.rand(H, W).astype(np.float32) * np.linspace(
            1.0, 0.3, H, dtype=np.float32)[:, None])
    mask = np.zeros((H, W), np.float32)
    mask[100:260, 400:800] = 1.0
    return img, disp, jnp.asarray(mask)


def make_poses(n):
    from mpiflow_tpu.motion.pose import ReferencePoseSampler
    from mpiflow_tpu.geom import transformation_from_parameters
    s = ReferencePoseSampler(114514)
    G_obj, G_cam = [], []
    for _ in range(n):
        (ac, tc), (ao, to) = s.sample_pair()
        G_cam.append(np.asarray(transformation_from_parameters(ac, tc)))
        G_obj.append(np.asarray(transformation_from_parameters(ao, to)))
    return np.stack(G_obj), np.stack(G_cam)


def bench_fused():
    import jax
    import jax.numpy as jnp
    from mpiflow_tpu.geom.camera import make_intrinsics
    from mpiflow_tpu.geom.homography import mpi_plane_disparities
    from mpiflow_tpu.models.geometric import geometric_mpi
    from mpiflow_tpu.render.dynamic import render_dynamic_sample

    rng = np.random.RandomState(0)
    img, disp, mask = make_inputs(rng)
    K = jnp.asarray(make_intrinsics(W, H))
    disparities = jnp.asarray(mpi_plane_disparities(S))
    G_obj, G_cam = make_poses(REPEAT)
    mode = _resolve_mode()

    @jax.jit
    def generate(img, disp, mask, G_obj, G_cam):
        mpi_rgb, mpi_sigma = geometric_mpi(img, disp, disparities)
        def one(Go, Gc):
            return render_dynamic_sample(mpi_rgb, mpi_sigma, disparities,
                                         img, mask, Go, Gc, K, K,
                                         inpaint_iters=128,
                                         mode=mode)
        return jax.lax.map(lambda a: one(*a), (G_obj, G_cam))

    args = (img, disp, mask, jnp.asarray(G_obj), jnp.asarray(G_cam))
    for _ in range(N_WARMUP):
        out = generate(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = generate(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITERS
    return REPEAT / dt  # pairs per second


def bench_reference_proxy():
    """The reference's dataflow (B=1, unfused, host compositing/inpaint)."""
    import jax
    import jax.numpy as jnp
    from mpiflow_tpu.geom.camera import make_intrinsics, intrinsics_inverse
    from mpiflow_tpu.geom.homography import (
        mpi_plane_disparities, pixel_grid_homo, plane_homographies,
        homography_grid, plane_flow_a2b, src_xyz_from_plane_disparity,
        tgt_xyz_from_plane_disparity)
    from mpiflow_tpu.models.geometric import geometric_mpi
    from mpiflow_tpu.ops.resample import bilinear_sample_border

    rng = np.random.RandomState(0)
    img, disp, mask = make_inputs(rng)
    K = jnp.asarray(make_intrinsics(W, H))
    disparities = jnp.asarray(mpi_plane_disparities(S))
    grid = jnp.asarray(pixel_grid_homo(H, W))
    G_obj, G_cam = make_poses(REPEAT)

    @jax.jit
    def predict(img, disp):
        return geometric_mpi(img, disp, disparities)

    @jax.jit
    def render_unfused(mpi_rgb, mpi_sigma, obj_mask, G):
        """Materializes all (S,C,H,W) intermediates like the reference."""
        K_inv = intrinsics_inverse(K)
        xyz_src = src_xyz_from_plane_disparity(grid, disparities, K_inv)
        xyz_tgt = tgt_xyz_from_plane_disparity(xyz_src, G)
        H_ts, H_st = plane_homographies(G, K, K, 1.0 / disparities)
        coords, _, valid = homography_grid(H_st, grid)
        stack = jnp.concatenate(
            [mpi_rgb, mpi_sigma, xyz_tgt,
             jnp.broadcast_to(obj_mask[None, None], (S, 1, H, W))], axis=1)
        warped = jax.vmap(bilinear_sample_border)(stack, coords)  # [S,8,H,W]
        flow_a2b = plane_flow_a2b(H_ts, grid)                     # [S,2,H,W]
        # tgt weights
        sigma_w = jnp.where(warped[:, 6:7] >= 0, warped[:, 3:4], 0.0)
        d = jnp.linalg.norm(warped[1:, 4:7] - warped[:-1, 4:7], axis=1,
                            keepdims=True)
        d = jnp.concatenate([d, jnp.full((1, 1, H, W), 1e3)], 0)
        T = jnp.exp(-sigma_w * d)
        Tacc = jnp.cumprod(T + 1e-6, 0)
        Tacc = jnp.concatenate([jnp.ones((1, 1, H, W)), Tacc[:-1]], 0)
        wt = Tacc * (1 - T)
        frame = (wt * warped[:, 0:3]).sum(0)
        objm = (wt * warped[:, 7:8]).sum(0)[0]
        # src weights for flow
        ray_n = jnp.linalg.norm(K_inv @ grid.reshape(3, -1), axis=0
                                ).reshape(H, W)
        depths = 1.0 / disparities
        ds = (depths[1:] - depths[:-1])[:, None, None, None] * ray_n
        ds = jnp.concatenate([ds, jnp.full((1, 1, H, W), 1e3)], 0)
        Ts = jnp.exp(-mpi_sigma * ds)
        Tsacc = jnp.cumprod(Ts + 1e-6, 0)
        Tsacc = jnp.concatenate([jnp.ones((1, 1, H, W)), Tsacc[:-1]], 0)
        ws = Tsacc * (1 - Ts)
        flow = (ws * flow_a2b.transpose(0, 3, 1, 2)).sum(0)
        return frame, objm, jnp.clip(flow, -200, 200)

    mpi_rgb, mpi_sigma = predict(img, disp)
    mask_np = np.asarray(mask)

    def one_sample(Go, Gc):
        f1, m1, fl1 = render_unfused(mpi_rgb, mpi_sigma, mask, jnp.asarray(Go))
        f2, m2, fl2 = render_unfused(mpi_rgb, mpi_sigma, 1 - mask,
                                     jnp.asarray(Gc))
        # six D2H transfers + host compositing (utils/utils.py:237-286)
        f1, m1, f2, m2 = map(np.asarray, (f1, m1, f2, m2))
        fl1 = np.array(fl1)
        fl2 = np.array(fl2)
        t = 0.99
        fl1[:, mask_np < t] = 0
        fl2[:, mask_np >= t] = 0
        u1 = np.clip(np.round(f1 * 255), 0, 255).astype(np.uint8)
        u2 = np.clip(np.round(f2 * 255), 0, 255).astype(np.uint8)
        u1[:, m1 < t] = 255
        u2[:, m2 < t] = 255
        mix = np.where((m1 >= t)[None], u1, u2).transpose(1, 2, 0)
        fill = np.where(m1 >= t, 1.0, m2)
        holes = (fill < t).astype(np.uint8)
        try:
            import cv2
            out = cv2.inpaint(np.ascontiguousarray(mix), holes, 3,
                              cv2.INPAINT_NS)
        except ImportError:
            out = mix
        return out, np.where(mask_np >= t, fl1, fl2)

    # warmup (compile)
    one_sample(G_obj[0], G_cam[0])
    t0 = time.perf_counter()
    n = 0
    for i in range(max(1, N_ITERS // 2)):
        for r in range(REPEAT):
            one_sample(G_obj[r], G_cam[r])
            n += 1
    dt = time.perf_counter() - t0
    return n / dt


def main():
    value = bench_fused()
    try:
        baseline = bench_reference_proxy()
    except Exception:
        baseline = float("nan")
    vs = value / baseline if baseline == baseline and baseline > 0 else None
    print(json.dumps({
        "metric": "image+flow pairs/sec/chip, 384x1280, 64-plane MPI, "
                  "dual-pose dynamic render + inpaint",
        "value": round(value, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(vs, 3) if vs else 1.0,
    }))


if __name__ == "__main__":
    main()
