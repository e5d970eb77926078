#!/usr/bin/env python
"""A/B the round-5 AdaMPI restructurings in isolation at product shape.

Times adampi_forward (64 planes, 384x1280, bf16, plane_chunk=64 i.e.
fully batched -- the bench.py configuration) under the four on/off
combinations of the gated-conv pair fusion and the FMN conv1 plane
factoring, using their env-var escapes. Each variant runs in a fresh
subprocess so the env toggles bind before tracing.

Run from the repo root on the chip:  python tools/bench_adampi_ab.py
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %r)
import numpy as np
import jax, jax.numpy as jnp
from mpiflow_tpu.utils.platform import enable_compile_cache
enable_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _adampi_params
from mpiflow_tpu.models.adampi import adampi_forward

H, W, S = 384, 1280, 64
params = _adampi_params()
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(3, H, W), jnp.bfloat16)
disp = jnp.asarray(rng.rand(H, W), jnp.bfloat16)

@jax.jit
def fwd(image, d):
    rgb, sigma, _ = adampi_forward(params, image, d, S, plane_chunk=S)
    return jnp.sum(rgb.astype(jnp.float32)) + jnp.sum(sigma.astype(jnp.float32))

acc = fwd(img, disp); float(acc)
per = []
for _ in range(3):
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(4):
        acc = acc + fwd(img, disp)
    float(acc)
    per.append((time.perf_counter() - t0) / 4)
print(json.dumps({"ms": round(float(np.mean(per)) * 1e3, 1),
                  "sd": round(float(np.std(per)) * 1e3, 1)}))
""" % ("%s",)


def run(name, env_extra):
    env = dict(os.environ, **env_extra)
    out = subprocess.run([sys.executable, "-c", CHILD % REPO], env=env,
                         capture_output=True, text=True, timeout=1500)
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    r = json.loads(line)
    print(json.dumps({"variant": name, **r}), flush=True)
    return r["ms"]


def main():
    res = {}
    res["both_on"] = run("both_on", {})
    res["no_gated_fuse"] = run("no_gated_fuse",
                               {"MPIFLOW_ADAMPI_NO_GATED_FUSE": "1"})
    res["no_conv1_factor"] = run("no_conv1_factor",
                                 {"MPIFLOW_ADAMPI_NO_CONV1_FACTOR": "1"})
    res["both_off"] = run("both_off",
                          {"MPIFLOW_ADAMPI_NO_GATED_FUSE": "1",
                           "MPIFLOW_ADAMPI_NO_CONV1_FACTOR": "1"})
    print(json.dumps(res))


if __name__ == "__main__":
    main()
