"""Benchmark: Pallas windowed-correlation lookup vs the XLA row-window path.

Measures (a) the isolated 12-iteration lookup chain (fwd and fwd+bwd) at the
RAFT training shape (batch 4, 288x960 -> h=36, w=120, P=17280) and (b) the
full RAFT train step with corr_impl xla vs pallas. Prints JSON.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # chained scalar dependency: block_until_ready alone returns early on
    # the axon remote backend (see bench.py)
    import jax.numpy as jnp
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        acc = acc + jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l).astype(jnp.float32), fn(*args), 0.0)
    float(acc)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from mpiflow_tpu.models.raft import (all_pairs_corr_pyramid,
                                         corr_lookup_windowed)
    from mpiflow_tpu.ops.pallas_corr import (corr_lookup_pallas,
                                             pallas_corr_fused_supported,
                                             pallas_corr_supported)

    N, H, W, D = 4, 288, 960, 256
    h, w = H // 8, W // 8
    rng = np.random.RandomState(0)
    fmap1 = jnp.asarray(rng.randn(N, h, w, D).astype(np.float32) * 0.1)
    fmap2 = jnp.asarray(rng.randn(N, h, w, D).astype(np.float32) * 0.1)
    coords0 = jnp.asarray(
        np.stack(np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32)), -1)[None]
        * np.ones((N, 1, 1, 1), np.float32))

    res = {"pallas_supported": pallas_corr_supported(),
           "fused_supported": pallas_corr_fused_supported()}

    def chain(lookup_fn, prep=None):
        def f(fmap1, fmap2, coords):
            pyr = all_pairs_corr_pyramid(fmap1, fmap2, 4)
            look = (lookup_fn if prep is None
                    else prep(pyr))          # e.g. pad once outside the scan
            def step(c, _):
                v = look(pyr, c, 4) if prep is None else look(c)
                # feed a little of the output back into coords: a real
                # data dependency like the GRU update, prevents batching
                c = c + v[..., :2] * 1e-3
                return c, jnp.sum(v)
            c, vs = jax.lax.scan(step, coords, None, length=12)
            return vs.sum()
        return f

    def fused_prep(pyr):
        from mpiflow_tpu.ops.pallas_corr import (corr_lookup_pallas_fused,
                                                 pad_pyramid_fused)
        padded, unpad, shapes = pad_pyramid_fused(pyr, 4)
        return lambda c: corr_lookup_pallas_fused(padded, unpad, shapes,
                                                  c, 4)

    for name, fn, prep in (("xla", corr_lookup_windowed, None),
                           ("pallas", corr_lookup_pallas, None),
                           ("fused", None, fused_prep)):
        if name == "pallas" and not res["pallas_supported"]:
            continue
        if name == "fused" and not res["fused_supported"]:
            continue
        f = jax.jit(chain(fn, prep))
        res[f"lookup12_fwd_ms_{name}"] = round(
            timed(f, fmap1, fmap2, coords0) * 1e3, 3)
        print(f"lookup12_fwd_ms_{name}: "
              f"{res[f'lookup12_fwd_ms_{name}']}", flush=True)
        g = jax.jit(jax.grad(chain(fn, prep), argnums=(0, 1)))
        res[f"lookup12_fwdbwd_ms_{name}"] = round(
            timed(g, fmap1, fmap2, coords0) * 1e3, 3)
        print(f"lookup12_fwdbwd_ms_{name}: "
              f"{res[f'lookup12_fwdbwd_ms_{name}']}", flush=True)

    # full train step
    import dataclasses
    from mpiflow_tpu.config import RAFTConfig, TrainConfig
    from mpiflow_tpu.train.raft_train import make_optimizer, make_train_step
    from mpiflow_tpu.cli.train_raft import init_random_params

    img1 = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32) * 255)
    flow = jnp.asarray(rng.randn(N, H, W, 2).astype(np.float32))
    valid = jnp.ones((N, H, W), jnp.float32)
    params = {k: jnp.asarray(v)
              for k, v in init_random_params(False, 0).items()}

    for name in ("xla", "pallas_matmul", "pallas_fused"):
        if name == "pallas_matmul" and not res["pallas_supported"]:
            continue
        if name == "pallas_fused" and not res["fused_supported"]:
            continue
        # the model dispatch prefers the fused kernel under "pallas";
        # MPIFLOW_CORR_NO_FUSED forces the matmul kernel for comparison
        if name == "pallas_matmul":
            os.environ["MPIFLOW_CORR_NO_FUSED"] = "1"
        else:
            os.environ.pop("MPIFLOW_CORR_NO_FUSED", None)
        tcfg = TrainConfig(num_steps=1000, batch_size=N, iters=12)
        mcfg = dataclasses.replace(RAFTConfig(), mixed_precision=True,
                                   corr_impl=name if name == "xla"
                                   else "pallas")
        tx, _ = make_optimizer(tcfg)
        step = make_train_step(tcfg, mcfg, tx, donate=False)
        opt_state = tx.init(params)

        def run(p, o):
            p2, o2, m = step(p, o, img1, img2, flow, valid)
            return m["loss"]
        res[f"train_step_ms_{name}"] = round(
            timed(run, params, opt_state, n=3) * 1e3, 1)
        print(f"train_step_ms_{name}: {res[f'train_step_ms_{name}']}",
              flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
