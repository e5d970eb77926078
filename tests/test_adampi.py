import numpy as np
import jax.numpy as jnp
import pytest

from mpiflow_tpu.models.adampi import (
    adampi_forward, feat_mask_network, resnet_encoder,
    depth_prediction_network,
)
from mpiflow_tpu.models.torch_convert import convert_state_dict
from mpiflow_tpu.geom.homography import mpi_plane_disparities


def _regen_state(g):
    """Rebuild the fixture's randomized torch state dict from its manifest
    (tests/golden/gen_adampi_golden.py randomize_state)."""
    rng = np.random.RandomState(int(g["sd_seed"]))
    sd = {}
    for k, shape_s in zip(g["sd_keys"], g["sd_shapes"]):
        shape = tuple(int(s) for s in shape_s.split(",") if s)
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = (0.5 + rng.rand(*shape)).astype(np.float32)
        elif len(shape) == 0:
            continue
        else:
            sd[k] = (rng.randn(*shape) * 0.2).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def adampi_setup(request):
    load = request.getfixturevalue("golden")
    g = load("adampi")
    params = {k: jnp.asarray(v)
              for k, v in convert_state_dict(_regen_state(g)).items()}
    img = jnp.asarray(g["img"][0])          # [3,H,W]
    disp = jnp.asarray(g["disp"][0, 0])     # [H,W]
    return g, params, img, disp


def test_feature_mask_matches_reference(adampi_setup):
    g, params, img, disp = adampi_setup
    disparities = jnp.asarray(mpi_plane_disparities(8))
    np.testing.assert_allclose(np.asarray(disparities), g["render_disp"][0],
                               atol=1e-6)
    fm = feat_mask_network(params, img.transpose(1, 2, 0)[None],
                           disp[None, :, :, None], disparities)
    np.testing.assert_allclose(np.asarray(fm), g["feature_mask"][0],
                               rtol=1e-4, atol=1e-5)


def test_encoder_matches_reference(adampi_setup):
    g, params, img, disp = adampi_setup
    feats = resnet_encoder(params, img.transpose(1, 2, 0)[None],
                           disp[None, :, :, None])
    for i, f in enumerate(feats):
        ref = g[f"feat{i}"][0].transpose(1, 2, 0)  # CHW -> HWC
        # f32 accumulation-order noise grows with depth; 5e-4 abs on
        # activations of magnitude ~30 is ~1e-5 relative
        np.testing.assert_allclose(np.asarray(f[0]), ref, rtol=2e-3,
                                   atol=5e-4, err_msg=f"scale {i}")


def test_full_adampi_matches_reference(adampi_setup):
    g, params, img, disp = adampi_setup
    rgb, sigma, disparities = adampi_forward(params, img, disp, num_planes=8)
    mpi = np.concatenate([np.asarray(rgb), np.asarray(sigma)], axis=1)
    # fp32 accumulation noise through ~30 conv layers: keep a tight relative
    # gate but allow 1e-3 absolute outliers (observed: 2/524288 at 2.6e-4)
    np.testing.assert_allclose(mpi, g["mpi"][0], rtol=1e-3, atol=1e-3)


def test_dpn_matches_reference(adampi_setup):
    g, params, img, disp = adampi_setup
    from mpiflow_tpu.models.nn import upsample_bilinear_align_corners
    H, W = img.shape[1], img.shape[2]
    rgb_low = upsample_bilinear_align_corners(
        img.transpose(1, 2, 0)[None], H // 4, W // 4)
    disp_low = upsample_bilinear_align_corners(
        disp[None, :, :, None], H // 4, W // 4)
    disparities = jnp.asarray(mpi_plane_disparities(8))
    out = depth_prediction_network(params, disparities, rgb_low, disp_low)
    np.testing.assert_allclose(np.asarray(out), g["dpn_disp"][0], rtol=1e-3,
                               atol=1e-5)


def test_plane_chunked_matches_unchunked(adampi_setup):
    """plane_chunk bounds memory but must not change outputs."""
    g, params, img, disp = adampi_setup
    rgb_a, sigma_a, _ = adampi_forward(params, img, disp, num_planes=8)
    rgb_b, sigma_b, _ = adampi_forward(params, img, disp, num_planes=8,
                                       plane_chunk=2)
    # XLA picks different conv algorithms per batch size; f32 accumulation
    # noise only (same tolerance as the reference-parity gate)
    np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_a),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(sigma_b), np.asarray(sigma_a),
                               rtol=1e-3, atol=1e-3)


def test_load_adampi_predictor_from_pth(tmp_path, adampi_setup):
    """Full checkpoint path: torch .pth -> converter -> jitted predictor."""
    import torch
    g, params, img, disp = adampi_setup
    # rebuild a torch-format state dict from the fixture manifest
    sd = {k: torch.from_numpy(v) for k, v in _regen_state(g).items()}
    path = str(tmp_path / "adampi_8p.pth")
    torch.save({"num_planes": 8, "weight": sd}, path)

    from mpiflow_tpu.models.adampi import load_adampi_predictor
    predict = load_adampi_predictor(path, width=img.shape[2],
                                    height=img.shape[1],
                                    compute_dtype=jnp.float32,
                                    plane_chunk=0)
    rgb, sigma = predict(img, disp)
    mpi = np.concatenate([np.asarray(rgb), np.asarray(sigma)], axis=1)
    np.testing.assert_allclose(mpi, g["mpi"][0], rtol=1e-3, atol=1e-3)
