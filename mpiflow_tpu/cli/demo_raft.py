"""RAFT pairwise inference over an image directory (reference: RAFT/demo.py).

  python -m mpiflow_tpu.cli.demo_raft --model weights/raft-things.pth \
      --path demo-frames --out demo-out --iters 20
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help=".pth or .npz checkpoint")
    p.add_argument("--path", required=True, help="directory of frames")
    p.add_argument("--out", default="demo-out")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--small", action="store_true")
    args = p.parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from mpiflow_tpu.config import RAFTConfig
    from mpiflow_tpu.models.raft import raft_forward
    from mpiflow_tpu.models.torch_convert import (load_torch_checkpoint,
                                                  convert_state_dict)
    from mpiflow_tpu.train.evaluate import pad_to_multiple_of_8
    from mpiflow_tpu.viz.flow_viz import flow_to_color

    cfg = RAFTConfig.small_config() if args.small else RAFTConfig()
    if args.model.endswith(".npz"):
        params = dict(np.load(args.model))
        params.pop("__step__", None)
    else:
        ckpt = load_torch_checkpoint(args.model)
        params = convert_state_dict(ckpt.get("weight", ckpt))
    params = {k: jnp.asarray(v) for k, v in params.items()}

    @jax.jit
    def infer(i1, i2):
        return raft_forward(params, i1, i2, cfg, iters=args.iters)[-1]

    frames = sorted(glob.glob(os.path.join(args.path, "*.png"))
                    + glob.glob(os.path.join(args.path, "*.jpg")))
    os.makedirs(args.out, exist_ok=True)
    for f1, f2 in zip(frames[:-1], frames[1:]):
        img1 = np.asarray(Image.open(f1).convert("RGB"), np.float32)
        img2 = np.asarray(Image.open(f2).convert("RGB"), np.float32)
        p1, crop = pad_to_multiple_of_8(img1)
        p2, _ = pad_to_multiple_of_8(img2)
        flow = np.asarray(infer(jnp.asarray(p1[None]), jnp.asarray(p2[None])))
        flow = flow[0][crop[0], crop[1]]
        name = os.path.splitext(os.path.basename(f1))[0]
        viz = np.concatenate([img1.astype(np.uint8), flow_to_color(flow)], 0)
        Image.fromarray(viz).save(os.path.join(args.out, name + "_flow.png"))
        print(name, "max |flow|", np.abs(flow).max().round(2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
