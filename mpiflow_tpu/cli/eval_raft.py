"""RAFT evaluation CLI -- the reference's `python evaluate.py` entry point
(RAFT/evaluate.py:169-197): validate on KITTI / Sintel / Chairs or write
benchmark submissions.

Examples:
  python -m mpiflow_tpu.cli.eval_raft --model ckpt.npz --dataset kitti \
      --data_root datasets/KITTI
  python -m mpiflow_tpu.cli.eval_raft --model raft-things.pth \
      --dataset sintel_submission --data_root datasets/Sintel --out sub/
"""
from __future__ import annotations

import argparse
import json
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--model", required=True,
                   help=".npz (trained here) or torch .pth checkpoint")
    p.add_argument("--dataset", required=True,
                   choices=["kitti", "sintel", "chairs", "mpiflow",
                            "kitti_submission", "sintel_submission"])
    p.add_argument("--data_root", required=True)
    p.add_argument("--out", default="submission",
                   help="output dir for submission writers")
    p.add_argument("--small", action="store_true")
    p.add_argument("--iters", type=int, default=None,
                   help="refinement iterations (defaults: 24 KITTI/chairs, "
                        "32 Sintel)")
    p.add_argument("--mixed_precision", action="store_true")
    p.add_argument("--warm_start", action="store_true",
                   help="Sintel submission: warm-start from previous frame")
    return p


def load_model(path: str, small: bool, mixed: bool):
    import dataclasses
    import jax.numpy as jnp
    from mpiflow_tpu.config import RAFTConfig
    cfg = RAFTConfig.small_config() if small else RAFTConfig()
    cfg = dataclasses.replace(cfg, mixed_precision=mixed)
    if path.endswith(".pth"):
        from mpiflow_tpu.models.torch_convert import (convert_state_dict,
                                                      load_torch_checkpoint)
        ckpt = load_torch_checkpoint(path)
        params = convert_state_dict(ckpt.get("weight", ckpt))
    else:
        from mpiflow_tpu.train.raft_train import Trainer
        params, _ = Trainer.load_params(path)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    return params, cfg


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    params, cfg = load_model(args.model, args.small, args.mixed_precision)

    from mpiflow_tpu.train import evaluate as ev
    if args.dataset == "kitti":
        res = ev.validate_kitti(params, args.data_root, cfg,
                                iters=args.iters or 24)
    elif args.dataset == "sintel":
        res = ev.validate_sintel(params, args.data_root, cfg,
                                 iters=args.iters or 32)
    elif args.dataset == "chairs":
        res = ev.validate_chairs(params, args.data_root, cfg,
                                 iters=args.iters or 24)
    elif args.dataset == "mpiflow":
        # EPE on generator-output pairs (closing the quality loop on any
        # generated dataset, e.g. a held-out split)
        res = ev.validate_mpiflow(params, args.data_root, cfg,
                                  iters=args.iters or 24)
    elif args.dataset == "kitti_submission":
        ev.create_kitti_submission(params, args.data_root, args.out, cfg,
                                   iters=args.iters or 24)
        res = {"written": args.out}
    else:
        ev.create_sintel_submission(params, args.data_root, args.out, cfg,
                                    iters=args.iters or 32,
                                    warm_start=args.warm_start)
        res = {"written": args.out}
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
