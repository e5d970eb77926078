import numpy as np
import jax.numpy as jnp

from mpiflow_tpu.geom import (
    rot_from_axisangle, transformation_from_parameters,
    make_intrinsics, intrinsics_inverse,
    pixel_grid_homo, plane_homographies, homography_grid, plane_flow_a2b,
    mpi_plane_disparities, src_xyz_from_plane_disparity,
    tgt_xyz_from_plane_disparity,
)
from mpiflow_tpu.config import CameraConfig


def test_se3_matches_reference(golden):
    g = golden("se3")
    M = transformation_from_parameters(g["axisangle"], g["translation"])
    np.testing.assert_allclose(np.asarray(M), g["M"], atol=1e-6)
    Mi = transformation_from_parameters(g["axisangle"], g["translation"],
                                        invert=True)
    np.testing.assert_allclose(np.asarray(Mi), g["M_inv"], atol=1e-6)


def test_rotation_orthonormal():
    rng = np.random.RandomState(0)
    vec = rng.randn(8, 3).astype(np.float32) * 0.3
    R = np.asarray(rot_from_axisangle(vec))[:, :3, :3]
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-6)


def test_intrinsics_inverse_closed_form(golden):
    g = golden("homography")
    K = g["K"]
    K_inv = np.asarray(intrinsics_inverse(K))
    np.testing.assert_allclose(K_inv, np.linalg.inv(K.astype(np.float64)),
                               atol=1e-7)


def test_make_intrinsics_fp16_parity():
    K = make_intrinsics(1280, 384, CameraConfig(fp16_quantized=True))
    # the reference's fp16 K: 0.58 -> 0.58007812, times W/H in fp16
    ref = np.array([[0.58, 0, 0.5], [0, 0.58, 0.5], [0, 0, 1]], np.float16)
    ref[0] *= np.float16(1280)
    ref[1] *= np.float16(384)
    np.testing.assert_array_equal(K, ref.astype(np.float32))


def test_plane_homographies_match_reference(golden):
    g = golden("homography")
    depths = 1.0 / mpi_plane_disparities(8)
    np.testing.assert_allclose(depths, 1.0 / np.linspace(1, 0.001, 10)[1:-1],
                               rtol=1e-6)
    H_ts, H_st = plane_homographies(g["G"], g["K"], g["K"], g["depths"] * 0 + depths)
    # fixture depths equal 1/linspace disparities
    np.testing.assert_allclose(g["depths"], depths, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(H_ts), g["H_tgt_src"], rtol=2e-5,
                               atol=1e-4)
    # closed-form Sherman-Morrison inverse vs fp64 numerical inverse
    np.testing.assert_allclose(np.asarray(H_st), g["H_src_tgt"], rtol=2e-5,
                               atol=1e-5)


def test_homography_grid_flow_matches_reference(golden):
    g = golden("homography")
    grid = pixel_grid_homo(g["src"].shape[2], g["src"].shape[3])
    _, H_st = plane_homographies(g["G"], g["K"], g["K"], g["depths"])
    coords, flow_b2a, valid = homography_grid(jnp.asarray(H_st), grid)
    np.testing.assert_allclose(np.asarray(flow_b2a), g["flow_b2a"], atol=2e-3)
    assert (np.asarray(valid) == g["valid"]).mean() > 0.999

    H_ts, _ = plane_homographies(g["G"], g["K"], g["K"], g["depths"])
    flow_a2b = plane_flow_a2b(jnp.asarray(H_ts), grid)
    np.testing.assert_allclose(np.asarray(flow_a2b), g["flow_a2b"], atol=2e-3)


def test_xyz_from_plane_disparity(golden):
    g = golden("volume_render")
    grid = pixel_grid_homo(g["rgb"].shape[3], g["rgb"].shape[4])
    K_inv = intrinsics_inverse(g["K"])
    xyz_src = src_xyz_from_plane_disparity(grid, jnp.asarray(g["disp"]), K_inv)
    np.testing.assert_allclose(np.asarray(xyz_src), g["xyz_src"][0], rtol=1e-4,
                               atol=1e-3)
    xyz_tgt = tgt_xyz_from_plane_disparity(xyz_src, jnp.asarray(g["G"]))
    np.testing.assert_allclose(np.asarray(xyz_tgt), g["xyz_tgt"][0], rtol=1e-4,
                               atol=1e-3)
