import numpy as np
import jax.numpy as jnp
import pytest

from mpiflow_tpu.models.edgeconnect import edge_generator, inpaint_generator
from mpiflow_tpu.models.torch_convert import convert_state_dict


def _regen(keys, shapes, seed, uv=None, scale=0.05):
    rng = np.random.RandomState(int(seed))
    sd = {}
    for k, shape_s in zip(keys, shapes):
        shape = tuple(int(x) for x in shape_s.split(",") if x)
        if len(shape) == 0:
            continue
        if k.endswith("weight_u") or k.endswith("weight_v"):
            sd[k] = uv[f"uv.{k}"]  # torch-initialized power-iteration vectors
        else:
            sd[k] = (rng.randn(*shape) * scale).astype(np.float32)
    return sd


def test_inpaint_generator_matches_reference(golden):
    g = golden("edgeconnect")
    sd = _regen(g["inp_keys"], g["inp_shapes"], g["inp_seed"])
    params = {k: jnp.asarray(v) for k, v in convert_state_dict(sd).items()}
    x = jnp.asarray(g["x_inp"].transpose(0, 2, 3, 1))
    y = inpaint_generator(params, x)
    np.testing.assert_allclose(np.asarray(y),
                               g["y_inp"].transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_edge_generator_matches_reference_spectral_norm(golden):
    """Covers the spectral-norm weight materialization end-to-end."""
    g = golden("edgeconnect")
    uv = {k: g[k] for k in g if k.startswith("uv.")}
    sd = _regen(g["edge_keys"], g["edge_shapes"], g["edge_seed"], uv=uv)
    params = {k: jnp.asarray(v) for k, v in convert_state_dict(sd).items()}
    x = jnp.asarray(g["x_edge"].transpose(0, 2, 3, 1))
    y = edge_generator(params, x)
    np.testing.assert_allclose(np.asarray(y),
                               g["y_edge"].transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
