"""Property tests for compositing invariants (SURVEY.md §4's recommended
set): weight normalization, identity-pose behavior, hard-flow membership,
and guard/fallback consistency under random poses."""
import numpy as np
import jax.numpy as jnp
import pytest

from mpiflow_tpu.geom import transformation_from_parameters
from mpiflow_tpu.geom.camera import make_intrinsics
from mpiflow_tpu.geom.homography import mpi_plane_disparities
from mpiflow_tpu.models.geometric import geometric_mpi
from mpiflow_tpu.render import render_novel_view
from mpiflow_tpu.render.mpi import render_source_view, source_visibility

H, W, S = 48, 64, 8


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    disp = jnp.asarray((0.2 + 0.6 * rng.rand(H, W)).astype(np.float32))
    disparities = jnp.asarray(mpi_plane_disparities(S))
    rgb, sigma = geometric_mpi(img, disp, disparities)
    K = jnp.asarray(make_intrinsics(W, H))
    return img, rgb, sigma, disparities, K


def test_source_weights_sum_below_one(scene):
    """Volume-rendering weights w_s = T_acc*(1-T) satisfy sum <= 1 + S*eps
    (the +1e-6 cumprod epsilon adds at most eps per plane)."""
    _, rgb, sigma, disparities, K = scene
    T_acc = source_visibility(sigma, disparities, K)
    # reconstruct weights like the renderer does
    _, _, blend = render_source_view(rgb, sigma, disparities, K)
    np.testing.assert_allclose(np.asarray(blend), np.asarray(T_acc), atol=0)
    dist_T = np.asarray(T_acc[:, 0])
    assert (dist_T <= 1.0 + S * 1e-5).all()
    assert (dist_T >= 0).all()


def test_identity_pose_zero_flow(scene):
    """G = I => per-plane homographies are identity => composited flow = 0
    and the rendered frame equals the source-view composite."""
    img, rgb, sigma, disparities, K = scene
    out = render_novel_view(rgb, sigma, disparities, jnp.eye(4), K, K,
                            src_img=img)
    assert float(jnp.abs(out.flow).max()) < 1e-3
    src_rgb, _, blend = render_source_view(
        jnp.asarray(blend_rgb(rgb, img, K, sigma, disparities)),
        sigma, disparities, K)
    np.testing.assert_allclose(np.asarray(out.frame), np.asarray(src_rgb),
                               atol=1e-4)
    # every plane lands fully in-bounds
    assert (np.asarray(out.valid_sum) == S).all()


def blend_rgb(rgb, img, K, sigma, disparities):
    """The source blending the renderer fuses in (utils/utils.py:202-204)."""
    T_acc = source_visibility(sigma, disparities, K)
    return T_acc * img[None] + (1 - T_acc) * rgb


def test_hard_flow_is_a_plane_flow(scene):
    """hard_flow output must equal one of the per-plane homography flows at
    every pixel (argmax one-hot selection, mpi_rendering.py:126-130)."""
    img, rgb, sigma, disparities, K = scene
    G = transformation_from_parameters(jnp.asarray([0.01, -0.02, 0.005]),
                                       jnp.asarray([0.05, -0.03, 0.08]))
    out = render_novel_view(rgb, sigma, disparities, G, K, K, src_img=img,
                            hard_flow=True)
    from mpiflow_tpu.geom.homography import (pixel_grid_homo,
                                             plane_homographies)
    grid = jnp.asarray(pixel_grid_homo(H, W)).reshape(3, -1)
    H_ts, _ = plane_homographies(G, K, K, 1.0 / disparities)
    th = jnp.matmul(H_ts, grid[None])
    flows = np.asarray((th[:, 0:2] / th[:, 2:3]) - grid[None, 0:2]
                       ).reshape(S, 2, H, W)
    got = np.asarray(out.flow)
    dist = np.abs(flows - got[None]).max(axis=1)        # [S,H,W]
    assert (dist.min(axis=0) < 1e-4).all()


def test_weights_cover_opaque_scene(scene):
    """With large sigma everywhere the target weights must sum to ~1
    (first visible plane absorbs everything)."""
    img, rgb, _, disparities, K = scene
    sigma = jnp.full((S, 1, H, W), 50.0)
    G = transformation_from_parameters(jnp.asarray([0.0, 0.0, 0.0]),
                                       jnp.asarray([0.01, 0.0, 0.0]))
    out = render_novel_view(rgb, sigma, disparities, G, K, K, src_img=img)
    # frame is a convex combination of plane rgbs (in [0,1]) -> bounded
    assert float(out.frame.min()) >= -1e-4
    assert float(out.frame.max()) <= 1.0 + 1e-4


def test_random_pose_modes_agree(scene):
    """scan/batched/preblocked/quad agree for randomly drawn valid poses
    (not just the golden ones)."""
    from mpiflow_tpu.render.dynamic import render_dynamic_sample
    img, rgb, sigma, disparities, K = scene
    rng = np.random.RandomState(11)
    mask = jnp.zeros((H, W)).at[10:30, 20:50].set(1.0)
    for _ in range(3):
        ax = jnp.asarray(rng.uniform(-0.05, 0.05, 3).astype(np.float32))
        t = jnp.asarray(rng.uniform(-0.15, 0.15, 3).astype(np.float32))
        G1 = transformation_from_parameters(ax, t)
        G2 = transformation_from_parameters(-ax, 0.5 * t)
        outs = [render_dynamic_sample(rgb, sigma, disparities, img, mask,
                                      G1, G2, K, K, inpaint_iters=4,
                                      mode=m)
                for m in ("scan", "preblocked", "quad")]
        for o in outs[1:]:
            np.testing.assert_allclose(np.asarray(o.flow),
                                       np.asarray(outs[0].flow), atol=1e-4)
            np.testing.assert_array_equal(np.asarray(o.frame_mix_u8),
                                          np.asarray(outs[0].frame_mix_u8))
