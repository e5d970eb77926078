"""bf16 warp-table mode (RenderConfig.warp_dtype): ground-truth flow must
be UNCHANGED (analytic coords + f32 source weights), only the gathered
rgb/sigma/mask channels round. The reference itself renders from an fp16
model (utils/utils.py:188), so bf16 tables are reference-faithful; the
default stays float32 for bit-exact parity gates."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpiflow_tpu.geom.camera import make_intrinsics
from mpiflow_tpu.geom.homography import mpi_plane_disparities
from mpiflow_tpu.models.geometric import geometric_mpi
from mpiflow_tpu.render.dynamic import render_dynamic_sample

H, W, S = 32, 512, 8


def _inputs():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    disp = jnp.asarray(
        (np.linspace(0.9, 0.1, H)[:, None] * np.ones((H, W))).astype(
            np.float32))
    mask = np.zeros((H, W), np.float32)
    mask[8:20, 100:220] = 1.0
    K = jnp.asarray(make_intrinsics(W, H))
    disparities = jnp.asarray(mpi_plane_disparities(S))
    G = jnp.asarray(np.array([[1, 0, 0, .04], [0, 1, 0, .01],
                              [0, 0, 1, -.06], [0, 0, 0, 1]], np.float32))
    rgb, sigma = geometric_mpi(img, disp, disparities)
    return rgb, sigma, disparities, img, jnp.asarray(mask), G, K


@pytest.mark.parametrize("mode", ["pallas", "preblocked"])
def test_bf16_table_flow_exact_frames_close(mode):
    rgb, sigma, disparities, img, mask, G, K = _inputs()

    def run(wd):
        return render_dynamic_sample(rgb, sigma, disparities, img, mask,
                                     G, G, K, K, inpaint_iters=16,
                                     mode=mode, warp_dtype=wd)

    a = run(None)
    b = run(jnp.bfloat16)
    # labels: flow identical
    np.testing.assert_array_equal(np.asarray(a.flow), np.asarray(b.flow))
    # data: images within a few u8 counts of the f32 render
    d = np.abs(np.asarray(a.dst_u8).astype(int)
               - np.asarray(b.dst_u8).astype(int))
    assert d.mean() < 1.0, d.mean()
    # hole masks may flip only at threshold-boundary pixels
    assert (np.asarray(a.holes) != np.asarray(b.holes)).mean() < 0.01
