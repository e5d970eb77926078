import numpy as np
import jax.numpy as jnp
import pytest

from mpiflow_tpu.ops.resample import (
    bilinear_sample_border, resize_bilinear_align_corners, avg_pool2d,
    adaptive_avg_pool2d,
)
from mpiflow_tpu.ops.inpaint import diffusion_inpaint
from mpiflow_tpu.ops.morphology import dilate3x3, erode3x3

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_resize_matches_torch_align_corners():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 13, 17).astype(np.float32)
    out = resize_bilinear_align_corners(jnp.asarray(x), 32, 48)
    ref = F.interpolate(torch.from_numpy(x)[None], size=(32, 48),
                        mode="bilinear", align_corners=True)[0].numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    # downscale too
    out2 = resize_bilinear_align_corners(jnp.asarray(x), 7, 9)
    ref2 = F.interpolate(torch.from_numpy(x)[None], size=(7, 9),
                         mode="bilinear", align_corners=True)[0].numpy()
    np.testing.assert_allclose(np.asarray(out2), ref2, atol=1e-5)


def test_bilinear_sample_matches_torch_grid_sample_border():
    rng = np.random.RandomState(1)
    C, H, W = 4, 11, 13
    img = rng.rand(C, H, W).astype(np.float32)
    coords = (rng.rand(9, 10, 2).astype(np.float32)
              * np.array([W + 6, H + 6], np.float32) - 3.0)  # incl. OOB
    out = bilinear_sample_border(jnp.asarray(img), jnp.asarray(coords))

    # reference normalization (homography_sampler.py:149-156)
    g = coords.copy()
    g[..., 0] = (g[..., 0] + 0.5) / (W * 0.5) - 1
    g[..., 1] = (g[..., 1] + 0.5) / (H * 0.5) - 1
    ref = F.grid_sample(torch.from_numpy(img)[None],
                        torch.from_numpy(g)[None], padding_mode="border",
                        align_corners=False)[0].numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_avg_pool_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.rand(3, 8, 12).astype(np.float32)
    out = avg_pool2d(jnp.asarray(x), 2)
    ref = F.avg_pool2d(torch.from_numpy(x)[None], 2, stride=2)[0].numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 15, 21).astype(np.float32)
    for oh, ow in [(5, 7), (4, 6), (15, 21), (7, 9)]:
        out = adaptive_avg_pool2d(jnp.asarray(x), oh, ow)
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x)[None], (oh, ow))[0]
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5,
                                   err_msg=f"{oh}x{ow}")


def test_dilate_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(4)
    m = (rng.rand(16, 20) > 0.8).astype(np.uint8)
    out = dilate3x3(jnp.asarray(m.astype(np.float32)))
    ref = cv2.dilate(m, np.ones((3, 3), np.uint8), iterations=1)
    np.testing.assert_array_equal(np.asarray(out).astype(np.uint8), ref)


def test_erode_inverse_of_dilate_on_interior():
    m = np.zeros((12, 12), np.float32)
    m[4:8, 4:8] = 1
    d = np.asarray(dilate3x3(jnp.asarray(m)))
    e = np.asarray(erode3x3(jnp.asarray(d)))
    np.testing.assert_array_equal(e, m)


def test_diffusion_inpaint_preserves_known_and_fills():
    rng = np.random.RandomState(5)
    img = rng.rand(20, 24, 3).astype(np.float32) * 255
    hole = np.zeros((20, 24), bool)
    hole[8:12, 10:16] = True
    out = np.asarray(diffusion_inpaint(jnp.asarray(img), jnp.asarray(hole),
                                       num_iters=200))
    np.testing.assert_array_equal(out[~hole], img[~hole])
    # filled values bounded by the surrounding range (maximum principle)
    ring = img[6:14, 8:18, :]
    assert out[hole].min() >= ring.min() - 1e-3
    assert out[hole].max() <= ring.max() + 1e-3
    # and close to the mean of the boundary, i.e. actually diffused
    assert abs(out[hole].mean() - ring.mean()) < 30
