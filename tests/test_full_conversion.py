"""Full-size synthetic-.pth conversion gates.

The published checkpoints (adampi_64p.pth, raft-things.pth) are stripped
from the reference snapshot and unfetchable here (no egress,
.MISSING_LARGE_BLOBS). These gates exercise the complete conversion path at
the PUBLISHED layouts with synthetic weights -- full 64-plane AdaMPI
(gen_3dphoto_dynamic_v2.py:52-60's {'num_planes','weight'} container) and
the full RAFT model with nn.DataParallel 'module.' prefixes (the layout
torch.save(model.state_dict()) produces at RAFT/train.py:141-142,186) --
so conversion memory/time and every key-mapping branch runs before real
weights ever arrive. tests/test_real_checkpoints.py takes over (forward
parity vs torch) once weights are placed.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import GOLDEN_DIR
from mpiflow_tpu.models.torch_convert import convert_state_dict


def _full_adampi_state(rng):
    """The published 64-plane AdaMPI layout: identical parameter shapes to
    the committed manifest (conv shapes are plane-count independent; the
    plane axis is batch-folded, model/CPN/*.py)."""
    g = np.load(GOLDEN_DIR / "adampi.npz")
    sd = {}
    for k, shape_s in zip(g["sd_keys"], g["sd_shapes"]):
        shape = tuple(int(s) for s in shape_s.split(",") if s)
        if k.endswith("num_batches_tracked"):
            sd[k] = np.int64(10)
            continue
        if k.endswith("running_var"):
            sd[k] = (0.5 + rng.rand(*shape)).astype(np.float32)
        else:
            sd[k] = (rng.randn(*shape) * 0.1).astype(np.float32)
    return sd


def test_full_size_adampi_pth_converts_and_runs(tmp_path):
    """adampi_64p.pth layout end to end: torch container -> converter ->
    one 64-plane jitted forward (plane-chunked to fit the CPU runner)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in _full_adampi_state(rng).items()}
    path = str(tmp_path / "adampi_64p.pth")
    torch.save({"num_planes": 64, "weight": sd}, path)

    from mpiflow_tpu.models.adampi import load_adampi_predictor
    # decoder's receptive-field extension (2x maxpool + 2x upsample around
    # the 1/32 features, decoder.py:127-131) needs H,W % 128 == 0
    H, W = 128, 256
    predict = load_adampi_predictor(path, width=W, height=H,
                                    compute_dtype=jnp.float32,
                                    plane_chunk=16)
    img = jnp.asarray(rng.rand(3, H, W), jnp.float32)
    disp = jnp.asarray(rng.rand(H, W), jnp.float32)
    rgb, sigma = predict(img, disp)
    assert rgb.shape == (64, 3, H, W)
    assert sigma.shape == (64, 1, H, W)
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.isfinite(np.asarray(sigma)).all()
    assert (np.asarray(sigma) >= 1e-4 - 1e-7).all()   # relu(.)+1e-4


def test_full_raft_dataparallel_pth_converts_and_runs(tmp_path):
    """raft-things.pth layout end to end: 'module.'-prefixed full-model
    state dict -> converter (prefix strip + OIHW->HWIO + buffer drop) ->
    one full-RAFT forward. Every published key must map, no extras."""
    torch = pytest.importorskip("torch")
    from mpiflow_tpu.models.raft import raft_forward
    from mpiflow_tpu.models.raft_init import raft_param_shapes
    from mpiflow_tpu.config import RAFTConfig

    rng = np.random.RandomState(1)
    shapes = raft_param_shapes(small=False)
    sd = {}
    for k, shape in shapes.items():
        if len(shape) == 4:
            # torch stores OIHW; the manifest is HWIO
            v = rng.randn(shape[3], shape[2], shape[0],
                          shape[1]).astype(np.float32) * 0.05
        elif k.endswith("running_var"):
            v = (0.5 + rng.rand(*shape)).astype(np.float32)
        elif k.endswith(("bias", "running_mean")):
            v = np.zeros(shape, np.float32)
        else:
            v = np.ones(shape, np.float32)
        sd["module." + k] = torch.from_numpy(v)
        if k.endswith("running_var"):
            sd["module." + k.replace("running_var", "num_batches_tracked")] \
                = torch.tensor(100)
    path = str(tmp_path / "raft-things.pth")
    torch.save(sd, path)

    from mpiflow_tpu.models.torch_convert import load_torch_checkpoint
    ckpt = load_torch_checkpoint(path)
    params = convert_state_dict(ckpt.get("weight", ckpt))
    # exact key coverage both ways, at the converted (HWIO) shapes
    assert set(params) == set(shapes)
    for k, v in params.items():
        assert v.shape == tuple(shapes[k]), k

    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3) * 255, jnp.float32)
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3) * 255, jnp.float32)
    preds = raft_forward(jparams, img1, img2, RAFTConfig(), iters=2)
    assert preds.shape == (2, 1, 64, 96, 2)
    assert np.isfinite(np.asarray(preds)).all()
