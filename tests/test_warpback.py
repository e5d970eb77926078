import os

import numpy as np
import jax.numpy as jnp
import pytest

from mpiflow_tpu.warpback.renderer import rgbd_render, visible_mask
from mpiflow_tpu.warpback.datasets import (
    WarpbackStage1, WarpbackStage2, rand_range_tensor, K_NORM,
)


def _toy_rgbd(h=64, w=96):
    rng = np.random.RandomState(0)
    rgb = rng.rand(3, h, w).astype(np.float32)
    # smooth fronto-parallel-ish disparity with a near blob
    disp = np.full((h, w), 0.3, np.float32)
    disp[20:40, 30:60] = 0.7
    return jnp.asarray(rgb), jnp.asarray(disp)


def test_identity_pose_reconstructs_image():
    rgb, disp = _toy_rgbd()
    ext = jnp.eye(4)
    render, out_disp, mask = rgbd_render(rgb, disp, jnp.asarray(K_NORM), ext)
    inside = np.asarray(mask) > 0.5
    assert inside.mean() > 0.9
    err = np.abs(np.asarray(render) - np.asarray(rgb))[:, inside]
    assert err.mean() < 0.02
    derr = np.abs(np.asarray(out_disp) - np.asarray(disp))[inside]
    assert derr.mean() < 0.01


def test_translation_creates_holes_and_parallax():
    rgb, disp = _toy_rgbd()
    ext = jnp.eye(4).at[0, 3].set(0.2)
    render, out_disp, mask = rgbd_render(rgb, disp, jnp.asarray(K_NORM), ext)
    m = np.asarray(mask)
    assert 0.3 < (m > 0.5).mean() < 1.0
    # disocclusion holes must appear next to the near blob
    assert (m[20:40, :] < 0.5).any()


def test_visible_mask_marks_depth_edges():
    _, disp = _toy_rgbd()
    vis = np.asarray(visible_mask(disp))
    # edges of the blob masked out, interior visible
    assert vis[30, 45] == 1.0
    assert vis[5, 5] == 1.0
    edge_band = vis[19:22, 30:60]
    assert edge_band.min() == 0.0


def test_rand_range_tensor_distribution():
    rng = np.random.RandomState(0)
    vals = np.array([rand_range_tensor(rng, 0.2) for _ in range(500)])
    a = np.abs(vals)
    assert (a >= 0.1 - 1e-9).all() and (a <= 0.2 + 1e-9).all()
    assert (vals > 0).any() and (vals < 0).any()
    assert rand_range_tensor(rng, -1) == 0.0


def _make_warpback_dir(tmp_path, n=2, h=48, w=64):
    from PIL import Image
    rng = np.random.RandomState(1)
    os.makedirs(tmp_path / "dpt_depth", exist_ok=True)
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        disp16 = (rng.rand(h, w) * 0.5 * (2 ** 16 - 1)).astype(np.uint16)
        Image.fromarray(img).save(tmp_path / f"{i:03d}.jpg")
        Image.fromarray(disp16).save(tmp_path / "dpt_depth" / f"{i:03d}.png")


def test_stage1_dataset(tmp_path):
    _make_warpback_dir(tmp_path)
    ds = WarpbackStage1(str(tmp_path), width=64, height=48, seed=0)
    assert len(ds) == 2
    item = ds[0]
    assert item["rgb"].shape == (3, 48, 64)
    assert item["mask"].shape == (48, 64)
    assert set(np.unique(item["mask"] > 0.5)) <= {False, True}
    assert np.isfinite(item["warp_back_disp"]).all()


def test_stage2_dataset_diffusion_fallback(tmp_path):
    _make_warpback_dir(tmp_path, n=1)
    ds = WarpbackStage2(str(tmp_path), ec_params=None, width=64, height=48,
                        seed=0)
    item = ds[0]
    assert item["src_rgb"].shape == (3, 48, 64)
    assert np.isfinite(item["src_rgb"]).all()
    assert np.isfinite(item["src_disp"]).all()
    assert item["cam_ext"].shape == (4, 4)


def test_edgeconnect_random_weights_forward():
    """EdgeConnect nets run and produce sane ranges with random weights."""
    from mpiflow_tpu.models.edgeconnect import (edge_generator,
                                                inpaint_generator)
    rng = np.random.RandomState(0)

    def conv(cin, cout, k):
        return (rng.randn(k, k, cin, cout) * 0.05).astype(np.float32)

    def trunk(cin, cout):
        p = {}
        p["encoder.1.weight"] = conv(cin, 64, 7)
        p["encoder.1.bias"] = np.zeros(64, np.float32)
        p["encoder.4.weight"] = conv(64, 128, 4)
        p["encoder.4.bias"] = np.zeros(128, np.float32)
        p["encoder.7.weight"] = conv(128, 256, 4)
        p["encoder.7.bias"] = np.zeros(256, np.float32)
        for i in range(8):
            p[f"middle.{i}.conv_block.1.weight"] = conv(256, 256, 3)
            p[f"middle.{i}.conv_block.5.weight"] = conv(256, 256, 3)
        # conv-transpose weights stored HWOI
        p["decoder.0.weight"] = (rng.randn(4, 4, 128, 256) * 0.05
                                 ).astype(np.float32)
        p["decoder.0.bias"] = np.zeros(128, np.float32)
        p["decoder.3.weight"] = (rng.randn(4, 4, 64, 128) * 0.05
                                 ).astype(np.float32)
        p["decoder.3.bias"] = np.zeros(64, np.float32)
        p["decoder.7.weight"] = conv(64, cout, 7)
        p["decoder.7.bias"] = np.zeros(cout, np.float32)
        return {k: jnp.asarray(v) for k, v in p.items()}

    x = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    out = inpaint_generator(trunk(4, 3), x)
    assert out.shape == (1, 32, 32, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    e = edge_generator(trunk(3, 1), x[..., :3])
    assert e.shape == (1, 32, 32, 1)
    assert float(e.min()) >= 0 and float(e.max()) <= 1


def test_spectral_norm_materialization():
    """convert_state_dict computes W/sigma from weight_orig + weight_u."""
    import torch
    import torch.nn as nn
    from mpiflow_tpu.models.torch_convert import convert_state_dict
    torch.manual_seed(0)
    conv = nn.utils.spectral_norm(nn.Conv2d(3, 8, 3))
    conv.eval()
    with torch.no_grad():
        _ = conv(torch.randn(1, 3, 8, 8))  # settle u
        w_eff = conv.weight.clone()        # torch's effective weight
    sd = {k: v for k, v in conv.state_dict().items()}
    out = convert_state_dict(sd)
    np.testing.assert_allclose(out["weight"],
                               w_eff.numpy().transpose(2, 3, 1, 0),
                               rtol=1e-4, atol=1e-6)


def test_stage2_inpaint_chain_matches_reference(golden):
    """Chained stage-2 golden: our warp output -> canny -> EdgeConnect trio
    -> hole-merged (rgb, disp) pair, vs the reference inpaint() chain
    (stage2_dataset.py:113-133) executed in torch on the SAME warp/edge
    inputs (tests/golden/gen_stage2_golden.py; the warp and edge substitutions
    are documented there -- this gates the grayscale/concat/offset/merge
    chain and all three generator forwards chained together)."""
    from mpiflow_tpu.models.torch_convert import convert_state_dict
    from mpiflow_tpu.warpback.datasets import WarpbackStage2

    g = golden("stage2_chain")

    def regen(prefix, uv=None):
        rng = np.random.RandomState(int(g[f"{prefix}_seed"]))
        sd = {}
        for k, shape_s in zip(g[f"{prefix}_keys"], g[f"{prefix}_shapes"]):
            shape = tuple(int(x) for x in shape_s.split(",") if x)
            if len(shape) == 0:
                continue
            if k.endswith("weight_u") or k.endswith("weight_v"):
                sd[k] = uv[f"uv.{k}"]
            else:
                sd[k] = (rng.randn(*shape) * 0.05).astype(np.float32)
        return {k: jnp.asarray(v) for k, v in convert_state_dict(sd).items()}

    uv = {k: g[k] for k in g if k.startswith("uv.")}
    ec = {"edge": regen("edge", uv), "inpaint": regen("inp"),
          "disp": regen("disp")}

    ds = WarpbackStage2.__new__(WarpbackStage2)
    ds.ec = ec
    rgb_m, disp_m = ds._inpaint(jnp.asarray(g["warp_rgb"]),
                                jnp.asarray(g["warp_disp"]),
                                jnp.asarray(g["warp_mask"]))
    np.testing.assert_allclose(np.asarray(rgb_m), g["image_merged"][0],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(disp_m), g["disp_merged"][0, 0],
                               rtol=1e-3, atol=2e-3)


def test_batched_synthesizer_matches_per_item():
    """make_stage2_synthesizer (one jitted batch program) must equal the
    per-item stage-2 path exactly: conv/instance-norm/canny are all
    per-sample computations, so batching is a pure layout change."""
    from mpiflow_tpu.warpback.datasets import (
        inpaint_rgbd_batch, make_stage2_synthesizer, random_edgeconnect_params,
        sample_warpback_pose, DEFAULT_TRANS_RANGE)

    rng = np.random.RandomState(3)
    B, h, w = 2, 64, 96
    rgb = jnp.asarray(rng.rand(B, 3, h, w).astype(np.float32))
    disp = jnp.asarray((0.2 + 0.6 * rng.rand(B, h, w)).astype(np.float32))
    ext = jnp.asarray(np.stack([
        sample_warpback_pose(rng, DEFAULT_TRANS_RANGE)[0] for _ in range(B)]))

    ec = random_edgeconnect_params(seed=5)
    out = make_stage2_synthesizer(ec)(rgb, disp, ext)

    for i in range(B):
        wr, wd, wm = rgbd_render(rgb[i], disp[i], jnp.asarray(K_NORM), ext[i])
        np.testing.assert_allclose(np.asarray(out["warp_rgb"][i]),
                                   np.asarray(wr), atol=1e-5)
        sr, sd = inpaint_rgbd_batch(ec, wr[None], wd[None], wm[None])
        np.testing.assert_allclose(np.asarray(out["src_rgb"][i]),
                                   np.asarray(sr[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["src_disp"][i]),
                                   np.asarray(sd[0]), atol=1e-4)


# --------------------------------------------------- rasterizer oracle gate
def _smooth_scene(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([0.5 + 0.4 * np.sin(xx / 9.0),
                    0.5 + 0.4 * np.cos(yy / 7.0),
                    0.5 + 0.3 * np.sin((xx + yy) / 11.0)], 0)
    disp = 0.25 + 0.1 * np.sin(xx / 15.0) * np.cos(yy / 13.0)
    disp[15:30, 25:45] += 0.35
    return rgb.astype(np.float64), disp.astype(np.float64)


def test_raster_oracle_identity_is_exact():
    """The oracle itself: with an identity pose every pixel center
    coincides with a mesh vertex, so the barycentric render must return
    the input attributes exactly (float tolerance). Validates the oracle's
    NDC/projection math against the construct_mesh unprojection."""
    from tests.raster_oracle import rasterize_rgbd_reference
    rgb, disp = _smooth_scene()
    render, out_disp, mask = rasterize_rgbd_reference(
        rgb, disp, np.asarray(K_NORM), np.eye(4))
    inside = mask > 0.99
    assert inside.mean() > 0.8            # vis mask trims blob edges only
    assert np.abs(render - rgb)[:, inside].max() < 1e-9
    # output disparity is 1/(z+1e-4) of z=1/(disp+1e-4): eps-squared error
    assert np.abs(out_disp - disp)[inside].max() < 2e-4


@pytest.mark.parametrize("ext", [
    np.eye(4),
    np.array([[1, 0, 0, 0.08], [0, 1, 0, -0.05],
              [0, 0, 1, 0.06], [0, 0, 0, 1.0]]),
])
def test_rgbd_render_matches_raster_oracle(ext):
    """PARITY gate for the supersampled-splat renderer vs the reference
    rasterizer semantics (warpback/utils.py:19-119), tolerances as stated
    in docs/PARITY.md: coverage IoU > 0.99; on mutually-valid pixels
    (both masks > 0.7) mean |rgb| < 0.02 with p95 < 0.05 and mean
    relative disparity error < 0.02. Measured headroom is ~3-5x (mean
    rgb 0.003-0.007 at supersample=4 on this scene)."""
    from tests.raster_oracle import rasterize_rgbd_reference
    rgb, disp = _smooth_scene()
    r_o, d_o, m_o = rasterize_rgbd_reference(
        rgb, disp, np.asarray(K_NORM), ext)
    r_j, d_j, m_j = [np.asarray(x) for x in rgbd_render(
        jnp.asarray(rgb, jnp.float32), jnp.asarray(disp, jnp.float32),
        jnp.asarray(K_NORM, jnp.float32), jnp.asarray(ext, jnp.float32),
        supersample=4)]
    iou = (((m_o > 0.5) & (m_j > 0.5)).sum()
           / max(1, ((m_o > 0.5) | (m_j > 0.5)).sum()))
    assert iou > 0.99, iou
    both = (m_o > 0.7) & (m_j > 0.7)
    assert both.mean() > 0.5
    rgb_err = np.abs(r_o - r_j)[:, both]
    assert rgb_err.mean() < 0.02, rgb_err.mean()
    assert np.percentile(rgb_err, 95) < 0.05
    d_rel = (np.abs(d_o - d_j) / np.maximum(d_o, 1e-3))[both]
    assert d_rel.mean() < 0.02, d_rel.mean()
