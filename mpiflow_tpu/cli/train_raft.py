"""RAFT training CLI; flag-compatible with the reference
(RAFT/train.py:217-240, launch recipe RAFT/train_standard.sh).

Example (the paper's fine-tune recipe):
  python -m mpiflow_tpu.cli.train_raft --name raft-mpi-flow --stage mpi-flow \
      --data_root out/kitti --restore_ckpt weights/raft-things.pth \
      --num_steps 50000 --batch_size 6 --lr 1e-4 --image_size 288 960 \
      --wdecay 1e-5 --gamma 0.85 --validation kitti
"""
from __future__ import annotations

import argparse
import logging


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="raft")
    p.add_argument("--stage", default="mpi-flow")
    p.add_argument("--restore_ckpt", default=None,
                   help=".pth (torch) or .npz (converted) checkpoint")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--small", action="store_true")
    p.add_argument("--mixed_precision", action="store_true")
    p.add_argument("--validation", type=str, nargs="+", default=[])
    p.add_argument("--kitti_root", type=str, default="datasets/KITTI")
    p.add_argument("--sintel_root", type=str, default="datasets/Sintel")
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--image_size", type=int, nargs="+", default=[384, 512])
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--wdecay", type=float, default=5e-5)
    p.add_argument("--epsilon", type=float, default=1e-8)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--add_noise", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--run_dir", default=None,
                   help="metrics sink dir (metrics.jsonl + TB events); "
                        "defaults to runs/{name} like the reference's "
                        "TensorBoard run dirs")
    p.add_argument("--freeze_bn", choices=["auto", "on", "off"],
                   default="auto",
                   help="auto = freeze except for the chairs stage "
                        "(RAFT/train.py:146-148)")
    p.add_argument("--corr_impl", choices=["xla", "pallas"],
                   default="pallas",
                   help="windowed-correlation lookup: the Pallas kernel "
                        "(ops/pallas_corr; bit-exact, falls back to xla "
                        "off-TPU) or the XLA row-window gather")
    return p


def init_random_params(small: bool, seed: int = 0):
    """He-init a RAFT parameter dict (for training from scratch)."""
    import numpy as np
    from mpiflow_tpu.models.raft_init import raft_param_shapes
    rng = np.random.RandomState(seed)
    params = {}
    for k, shape in raft_param_shapes(small).items():
        if k.endswith("running_mean"):
            params[k] = np.zeros(shape, np.float32)
        elif k.endswith("running_var"):
            params[k] = np.ones(shape, np.float32)
        elif (k.endswith(".bias") or
              (len(shape) == 1 and not k.endswith("weight"))):
            params[k] = np.zeros(shape, np.float32)
        elif len(shape) == 1:  # norm weight
            params[k] = np.ones(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[:-1]))
            std = np.sqrt(2.0 / fan_in)
            params[k] = (rng.randn(*shape) * std).astype(np.float32)
    return params


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    from mpiflow_tpu.config import RAFTConfig, TrainConfig
    from mpiflow_tpu.data import fetch_dataset, make_train_iterator
    from mpiflow_tpu.parallel.mesh import make_mesh
    from mpiflow_tpu.train.raft_train import Trainer
    from mpiflow_tpu.models.torch_convert import (load_torch_checkpoint,
                                                  convert_state_dict)

    # reference: freeze BN for every stage except chairs (train.py:146-148)
    freeze_bn = {"auto": args.stage != "chairs",
                 "on": True, "off": False}[args.freeze_bn]
    cfg = TrainConfig(
        name=args.name, stage=args.stage, restore_ckpt=args.restore_ckpt,
        data_root=args.data_root, lr=args.lr, num_steps=args.num_steps,
        batch_size=args.batch_size, image_size=tuple(args.image_size),
        iters=args.iters, wdecay=args.wdecay, epsilon=args.epsilon,
        clip=args.clip, gamma=args.gamma, add_noise=args.add_noise,
        seed=args.seed, validation=tuple(args.validation),
        freeze_bn=freeze_bn)
    import dataclasses as _dc
    model_cfg = RAFTConfig.small_config() if args.small else RAFTConfig()
    model_cfg = _dc.replace(model_cfg, mixed_precision=args.mixed_precision,
                            corr_impl=args.corr_impl)

    dataset = fetch_dataset(args.stage, args.data_root,
                            tuple(args.image_size), seed=args.seed)
    logging.info("Training with %d image pairs", len(dataset))
    data_iter = make_train_iterator(dataset, args.batch_size, seed=args.seed)

    if args.restore_ckpt:
        if args.restore_ckpt.endswith(".npz"):
            from mpiflow_tpu.train.raft_train import Trainer as _T
            params, _ = _T.load_params(args.restore_ckpt)
        else:
            ckpt = load_torch_checkpoint(args.restore_ckpt)
            sd = ckpt.get("weight", ckpt)
            params = convert_state_dict(sd)
        logging.info("restored %d tensors from %s", len(params),
                     args.restore_ckpt)
    else:
        params = init_random_params(args.small, args.seed)
        logging.info("initialized %d tensors from scratch", len(params))

    import os
    run_dir = args.run_dir or os.path.join("runs", args.name)
    mesh = make_mesh()
    trainer = Trainer(cfg, model_cfg, mesh=mesh, run_dir=run_dir)
    state = trainer.init_state(params)

    validate_fn = None
    if args.validation:
        def validate_fn(p):
            from mpiflow_tpu.train.evaluate import (validate_kitti,
                                                    validate_sintel)
            res = {}
            if "kitti" in args.validation:
                res.update(validate_kitti(p, args.kitti_root, model_cfg))
            if "sintel" in args.validation:
                res.update(validate_sintel(p, args.sintel_root, model_cfg))
            return res

    trainer.run(state, data_iter, checkpoint_dir=args.checkpoint_dir,
                validate_fn=validate_fn)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
