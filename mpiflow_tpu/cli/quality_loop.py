"""Close the generate -> train -> evaluate quality loop end-to-end.

The reference's definition of "done" is the downstream metric: train RAFT on
generated pairs and measure EPE (RAFT/train_standard.sh:2-7, README.md:74-105).
This CLI runs that loop self-contained, at configurable scale:

  1. synthesize (or accept via --base/--val_base) a base set of
     {images, disps, masks} scenes,
  2. generate train + held-out val image/flow pairs with the MPI-Flow
     pipeline (DatasetGenerator, dual-pose dynamic render),
  3. fine-tune / train RAFT on the train pairs,
  4. measure EPE on the held-out val pairs before and after training.

Prints one JSON summary line:
  {"epe_init": ..., "epe_final": ..., "improved": true, "train_pairs": N,
   "val_pairs": M, "loss_first": ..., "loss_last": ...}

Example (CPU-mesh CI scale, ~minutes):
  python -m mpiflow_tpu.cli.quality_loop --work_dir /tmp/qloop \
      --num_images 8 --val_images 2 --width 192 --height 96 --planes 12 \
      --repeat 4 --num_steps 120 --batch_size 2 --small --iters 6

Example (TPU, realistic scale):
  python -m mpiflow_tpu.cli.quality_loop --work_dir /tmp/qloop_tpu \
      --num_images 40 --val_images 8 --width 512 --height 160 --planes 32 \
      --repeat 5 --num_steps 600 --batch_size 4 --small
"""
from __future__ import annotations

import argparse
import json
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--work_dir", required=True)
    p.add_argument("--base", default=None,
                   help="existing {images,disps,masks} base set for training "
                        "(default: synthesize procedural scenes)")
    p.add_argument("--val_base", default=None,
                   help="existing base set for held-out validation")
    p.add_argument("--val_pairs", default=None,
                   help="existing generated val pairs dir; skips val "
                        "generation so every variant in a multi-variant "
                        "sweep is scored on the SAME held-out pairs "
                        "(tools/full_loop.py) instead of pairs rendered "
                        "by its own predictor")
    p.add_argument("--num_images", type=int, default=8,
                   help="synthesized training scenes (ignored with --base)")
    p.add_argument("--val_images", type=int, default=2,
                   help="synthesized held-out scenes (ignored with --val_base)")
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--planes", type=int, default=12)
    p.add_argument("--repeat", type=int, default=4)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--predictor",
                   choices=["geometric", "adampi", "adampi_random"],
                   default="geometric",
                   help="adampi_random = the full AdaMPI compute graph with "
                        "randomized published-layout weights (the "
                        "throughput-realistic path while the real "
                        "checkpoint is unobtainable)")
    p.add_argument("--ckpt_path", default="adampiweight/adampi_64p.pth")
    p.add_argument("--gen_only", action="store_true",
                   help="stop after pair generation; print generation "
                        "stats JSON (sustained-throughput runs)")
    p.add_argument("--profile", action="store_true",
                   help="per-stage generation wall-clock in the stats")
    # training
    p.add_argument("--num_steps", type=int, default=120)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--iters", type=int, default=6,
                   help="GRU refinement iterations during training")
    p.add_argument("--eval_iters", type=int, default=12)
    p.add_argument("--small", action="store_true",
                   help="RAFT-small (the right scale for a short loop)")
    p.add_argument("--restore_ckpt", default=None,
                   help="start from a checkpoint instead of random init")
    p.add_argument("--crop", type=int, nargs=2, default=None,
                   help="train crop [H W]; default 7/8 of generated size")
    p.add_argument("--eval_limit", type=int, default=None,
                   help="cap on evaluated val pairs")
    return p


def synthesize_base(root: str, n_images: int, height: int, width: int,
                    seed: int) -> None:
    """Procedural {images,disps,masks} scenes (utils/synth.py) written in
    the layout gen_3dphoto_dynamic_v2.py:74-78 consumes."""
    import numpy as np
    from PIL import Image

    from mpiflow_tpu.utils.synth import procedural_scene

    rng = np.random.RandomState(seed)
    for sub in ("images", "disps", "masks"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n_images):
        img, disp, mask = procedural_scene(rng, height, width)
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
        dsp = np.clip(disp * 255, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/images/{i:04d}.png")
        Image.fromarray(dsp).save(f"{root}/disps/{i:04d}.png")
        Image.fromarray(mask).save(f"{root}/masks/{i:04d}.png")


def generate_pairs(base: str, out: str, args, seed: int) -> dict:
    from mpiflow_tpu.config import (GenConfig, PoseConfig, RenderConfig,
                                    InpaintConfig)
    from mpiflow_tpu.pipeline import DatasetGenerator

    mpi_fn = None
    if args.predictor == "adampi":
        from mpiflow_tpu.models.adampi import load_adampi_predictor
        mpi_fn = load_adampi_predictor(args.ckpt_path, args.width,
                                       args.height)
    elif args.predictor == "adampi_random":
        from mpiflow_tpu.models.adampi import make_random_adampi_predictor
        mpi_fn = make_random_adampi_predictor(args.width, args.height,
                                              num_planes=args.planes)
    cfg = GenConfig(width=args.width, height=args.height, seed=seed,
                    repeat=args.repeat, base=base, out=out,
                    pose=PoseConfig(flavor="kitti_v2"),
                    render=RenderConfig(num_planes=args.planes))
    gen = DatasetGenerator(cfg, mpi_predict_fn=mpi_fn)
    return gen.run(base, out, profile=getattr(args, "profile", False))


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    work = args.work_dir
    os.makedirs(work, exist_ok=True)

    # -- 1. base scenes --------------------------------------------------
    base = args.base or os.path.join(work, "base")
    val_base = args.val_base or os.path.join(work, "base_val")
    if args.base is None:
        synthesize_base(base, args.num_images, args.height, args.width,
                        args.seed)
    if args.val_base is None and args.val_pairs is None:
        synthesize_base(val_base, args.val_images, args.height, args.width,
                        args.seed + 90001)

    # -- 2. generate train + held-out val pairs --------------------------
    train_out = os.path.join(work, "pairs_train")
    stats_t = generate_pairs(base, train_out, args, args.seed)
    if args.gen_only:
        print(json.dumps({"gen_only": True, "predictor": args.predictor,
                          "width": args.width, "height": args.height,
                          "planes": args.planes, **stats_t}))
        return 0
    if args.val_pairs:
        val_out = args.val_pairs
        n_val = len(os.listdir(os.path.join(val_out, "flows")))
        stats_v = {"samples": n_val}
    else:
        val_out = os.path.join(work, "pairs_val")
        stats_v = generate_pairs(val_base, val_out, args, args.seed + 1)
    logging.info("generated: train=%s val=%s", stats_t, stats_v)

    # -- 3. train RAFT ---------------------------------------------------
    from mpiflow_tpu.config import RAFTConfig, TrainConfig
    from mpiflow_tpu.data import fetch_dataset, make_train_iterator
    from mpiflow_tpu.parallel.mesh import make_mesh
    from mpiflow_tpu.train.raft_train import Trainer
    from mpiflow_tpu.train.evaluate import validate_mpiflow
    from mpiflow_tpu.cli.train_raft import init_random_params

    # RAFT needs >=64px on both axes (4 pyramid levels at 1/8 res)
    crop = tuple(args.crop) if args.crop else (
        max(64, args.height // 8 * 7 // 8 * 8),
        max(64, args.width // 8 * 7 // 8 * 8))
    cfg = TrainConfig(name="qloop", stage="mpi-flow", data_root=train_out,
                      lr=args.lr, num_steps=args.num_steps,
                      batch_size=args.batch_size, image_size=crop,
                      iters=args.iters, gamma=0.8, seed=args.seed,
                      freeze_bn=False, val_freq=min(500, args.num_steps))
    model_cfg = RAFTConfig.small_config() if args.small else RAFTConfig()

    if args.restore_ckpt:
        params, _ = Trainer.load_params(args.restore_ckpt)
    else:
        params = init_random_params(args.small, args.seed)

    # crash resume: a full train state (params + optimizer + step) is
    # checkpointed every val_freq steps under an orbax dir keyed by
    # num_steps (the best-variant extension reuses this work_dir with a
    # different horizon and must not collide with the base run's states)
    orbax_dir = os.path.join(work, f"orbax_{args.num_steps}")
    resume_step = Trainer.latest_orbax_step(orbax_dir)

    # epe_init belongs to the ORIGINAL initialization; persist it so a
    # resumed run reports the same row instead of re-grading the restored
    # params as "init"
    ev0_path = os.path.join(work, f"eval_init_{args.num_steps}.json")
    if resume_step and os.path.exists(ev0_path):
        with open(ev0_path) as fh:
            ev0 = json.load(fh)
    else:
        ev0 = validate_mpiflow(params, val_out, model_cfg,
                               iters=args.eval_iters, limit=args.eval_limit)
        with open(ev0_path, "w") as fh:
            json.dump({k: float(v) for k, v in ev0.items()}, fh)

    dataset = fetch_dataset("mpi-flow", train_out, crop, seed=args.seed)
    data_iter = make_train_iterator(dataset, args.batch_size, seed=args.seed,
                                    num_threads=2)
    run_dir = os.path.join(work, "run")
    # data-parallel over as many devices as divide the batch (a batch of 2
    # on an 8-device mesh trains on 2)
    import jax as _jax
    n_dev = len(_jax.devices())
    while args.batch_size % n_dev:
        n_dev -= 1
    mesh = make_mesh(num_devices=n_dev)
    trainer = Trainer(cfg, model_cfg, mesh=mesh, run_dir=run_dir)
    trainer.sum_freq = min(trainer.sum_freq, max(args.num_steps // 4, 1))
    state = trainer.init_state(params)
    if resume_step:
        state = trainer.restore_orbax(orbax_dir, resume_step, like=state)
        logging.info("resumed exact train state (params + optimizer) at "
                     "step %d from %s", state.step, orbax_dir)
    state = trainer.run(state, data_iter,
                        num_steps=args.num_steps - state.step,
                        checkpoint_dir=os.path.join(work, "checkpoints"),
                        orbax_dir=orbax_dir)

    ev1 = validate_mpiflow(state.params, val_out, model_cfg,
                           iters=args.eval_iters, limit=args.eval_limit)

    # loss trend from the persisted metric trail
    losses = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            if rec.get("split") == "train" and "loss" in rec:
                losses.append(rec["loss"])

    summary = {
        "epe_init": round(ev0["mpiflow-epe"], 4),
        "epe_final": round(ev1["mpiflow-epe"], 4),
        "3px_init": round(ev0["mpiflow-3px"], 4),
        "3px_final": round(ev1["mpiflow-3px"], 4),
        "improved": ev1["mpiflow-epe"] < ev0["mpiflow-epe"],
        "train_pairs": stats_t.get("samples", 0) + stats_t.get("skipped", 0),
        "val_pairs": stats_v.get("samples", 0) + stats_v.get("skipped", 0),
        "loss_first": round(losses[0], 4) if losses else None,
        "loss_last": round(losses[-1], 4) if losses else None,
        "steps": args.num_steps,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
