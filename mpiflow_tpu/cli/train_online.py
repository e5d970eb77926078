"""Online RAFT training: generate MPI-Flow pairs ON DEVICE and train on them
directly, no dataset written to disk.

The reference's "online training" results (README.md:74-86: 32k/320k steps on
COCO images, single V100) write the dataset first and read it back; here
generation and training interleave on the same chip and samples flow through
a host ring buffer -- the TPU-native equivalent with zero filesystem traffic.

  python -m mpiflow_tpu.cli.train_online --base data/coco --name raft-online \
      --num_steps 32000 --batch_size 6 --image_size 288 960 \
      --gen_every 4 --buffer 2000
"""
from __future__ import annotations

import argparse
import itertools
import logging


def build_parser():
    p = argparse.ArgumentParser()
    # generation side (reference gen flags)
    p.add_argument("--base", required=True)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--ext_cz", type=float, default=0.15)
    p.add_argument("--repeat", type=int, default=5)
    p.add_argument("--flavor", choices=["kitti_v2", "coco", "legacy"],
                   default="coco")
    p.add_argument("--planes", type=int, default=64)
    p.add_argument("--ckpt_path", default="adampiweight/adampi_64p.pth")
    p.add_argument("--predictor",
                   choices=["adampi", "geometric", "adampi_random"],
                   default="adampi")
    # training side (reference train flags)
    p.add_argument("--name", default="raft-online")
    p.add_argument("--restore_ckpt", default=None)
    p.add_argument("--resume_step", action="store_true",
                   help="continue the step counter from the restored "
                        ".npz's embedded step (periodic checkpoints "
                        "record it): trains num_steps-step MORE steps, "
                        "so a supervisor restart completes the original "
                        "horizon instead of redoing it; metrics.jsonl "
                        "appends, stitching the windows across restarts")
    p.add_argument("--small", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_steps", type=int, default=32000)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--image_size", type=int, nargs="+", default=[288, 960])
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--wdecay", type=float, default=1e-5)
    p.add_argument("--gamma", type=float, default=0.85)
    p.add_argument("--checkpoint_dir", default="checkpoints")
    # online plumbing
    p.add_argument("--buffer", type=int, default=1000,
                   help="ring-buffer capacity (samples)")
    p.add_argument("--gen_every", type=int, default=4,
                   help="generate one image's samples every N train steps")
    p.add_argument("--warmup_images", type=int, default=4)
    p.add_argument("--val_freq", type=int, default=5000,
                   help="checkpoint every N steps (long online runs should "
                        "survive a host OOM-kill)")
    p.add_argument("--remat_gru", action="store_true",
                   help="recompute GRU-scan activations in backward instead "
                        "of stashing all iterations (fits batch 6 in one "
                        "v5e chip's 16G HBM)")
    p.add_argument("--run_dir", default=None,
                   help="metrics sink (metrics.jsonl records loss/epe AND "
                        "buffer occupancy + generator duty cycle per "
                        "sum-freq window); defaults to runs/{name}")
    return p


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    import numpy as np
    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    from mpiflow_tpu.config import (GenConfig, PoseConfig, RenderConfig,
                                    RAFTConfig, TrainConfig)
    from mpiflow_tpu.data.datasets import InMemoryFlowPairs, make_train_iterator
    from mpiflow_tpu.pipeline.generator import DatasetGenerator
    from mpiflow_tpu.train.raft_train import Trainer
    from mpiflow_tpu.cli.train_raft import init_random_params
    import os

    gen_cfg = GenConfig(
        width=args.width, height=args.height, seed=args.seed,
        repeat=args.repeat,
        pose=PoseConfig(flavor=args.flavor, ext_cz=args.ext_cz),
        render=RenderConfig(num_planes=args.planes), rng_mode="jax")

    mpi_fn = None
    if args.predictor == "adampi":
        try:
            from mpiflow_tpu.models.adampi import load_adampi_predictor
            mpi_fn = load_adampi_predictor(args.ckpt_path, args.width,
                                           args.height)
        except (ImportError, FileNotFoundError) as e:
            logging.warning("AdaMPI unavailable (%s); geometric MPI", e)
    elif args.predictor == "adampi_random":
        from mpiflow_tpu.models.adampi import make_random_adampi_predictor
        mpi_fn = make_random_adampi_predictor(args.width, args.height,
                                              num_planes=args.planes)
    gen = DatasetGenerator(gen_cfg, mpi_predict_fn=mpi_fn)

    # image cycle
    img_base = os.path.join(args.base, "images")
    names = sorted(os.listdir(img_base))
    name_cycle = itertools.cycle(enumerate(names))

    aug = {"crop_size": tuple(args.image_size), "min_scale": -0.2,
           "max_scale": 0.4, "do_flip": False}
    buffer = InMemoryFlowPairs(args.buffer, aug_params=aug, seed=args.seed)

    sampler = None
    root_key = jax.random.PRNGKey(gen_cfg.seed)

    def generate_one():
        """Render one source image's `repeat` samples into the buffer."""
        for _ in range(len(names)):
            img_i, fname = next(name_cycle)
            name = fname.split(".")[0]
            try:
                pending = gen._dispatch_one(
                    img_i, fname, name, img_base,
                    os.path.join(args.base, "disps"),
                    os.path.join(args.base, "masks"),
                    sampler, root_key, set(), {"skipped": 0})
            except Exception as e:
                logging.warning("gen skip %s: %s", fname, e)
                continue
            if pending is None:
                continue
            keys, _, out = pending
            out = jax.tree_util.tree_map(np.asarray, out)
            for r in range(len(keys)):
                buffer.add(out.src_u8[r], out.dst_u8[r], out.flow[r])
            return True
        return False

    logging.info("warming buffer with %d images", args.warmup_images)
    for _ in range(args.warmup_images):
        generate_one()
    logging.info("buffer: %d samples", len(buffer))

    train_cfg = TrainConfig(
        name=args.name, stage="online", restore_ckpt=args.restore_ckpt,
        lr=args.lr, num_steps=args.num_steps, batch_size=args.batch_size,
        image_size=tuple(args.image_size), iters=args.iters,
        wdecay=args.wdecay, gamma=args.gamma, seed=args.seed,
        val_freq=args.val_freq)
    model_cfg = RAFTConfig.small_config() if args.small else RAFTConfig()
    if args.remat_gru:
        import dataclasses
        model_cfg = dataclasses.replace(model_cfg, remat_gru=True)
    trainer = Trainer(train_cfg, model_cfg)

    restored_step = 0
    if args.restore_ckpt:
        from mpiflow_tpu.models.torch_convert import (load_torch_checkpoint,
                                                      convert_state_dict)
        if args.restore_ckpt.endswith(".npz"):
            params, restored_step = Trainer.load_params(args.restore_ckpt)
        else:
            ckpt = load_torch_checkpoint(args.restore_ckpt)
            params = convert_state_dict(ckpt.get("weight", ckpt))
    else:
        params = init_random_params(args.small, args.seed)
    state = trainer.init_state(params)
    if args.resume_step and restored_step:
        state.step = restored_step
        logging.info("resuming the step counter at %d (optimizer restarts, "
                     "like the reference's --restore_ckpt)", restored_step)

    data_iter = make_train_iterator(buffer, args.batch_size, seed=args.seed,
                                    num_threads=2)
    import json
    import time
    from mpiflow_tpu.train.logger import MetricsLogger
    run_dir = args.run_dir or os.path.join("runs", args.name)
    logger = MetricsLogger(run_dir, sum_freq=100, print_fn=logging.info)
    # generator/trainer duty-cycle + buffer-health accounting (the
    # reference's online recipe is a 32k-step headline, README.md:74-86;
    # steady-state behavior must be observable, not assumed)
    gen_s = 0.0
    occupancies = []
    starved = 0
    t_start = time.time()
    win_t0 = t_start
    win_gen = 0.0
    win_steps = 0
    window_rates = []
    for step in range(state.step, args.num_steps):
        if step % args.gen_every == 0:
            tg = time.time()
            generate_one()
            dtg = time.time() - tg
            gen_s += dtg
            win_gen += dtg
        occupancies.append(len(buffer))
        if len(buffer) < args.batch_size:
            starved += 1
        batch = trainer.shard_batch(next(data_iter))
        state.params, state.opt_state, metrics = trainer.step_fn(
            state.params, state.opt_state, *batch)
        state.step += 1
        win_steps += 1
        logger.push(state.step, metrics, args.batch_size)
        if state.step % 100 == 0:
            dt = time.time() - win_t0
            window_rates.append(win_steps * args.batch_size / dt)
            logger.write_dict(state.step, {
                "buffer": len(buffer), "gen_duty": win_gen / dt,
                "img_per_sec": window_rates[-1]}, split="online")
            win_t0 = time.time()
            win_gen = 0.0
            win_steps = 0
        if state.step % train_cfg.val_freq == 0:
            trainer.save(state, args.checkpoint_dir)
            # crash-survivable evidence: a killed/OOM'd run still leaves a
            # summary alongside its periodic checkpoint (round-3's first
            # attempt died at ~step 1500 recording nothing)
            _write_summary(run_dir, state.step, time.time() - t_start,
                           gen_s, window_rates, occupancies, starved,
                           partial=True)
    trainer.save(state, args.checkpoint_dir, final=True)
    logger.close()
    data_iter.close()
    summary = _write_summary(run_dir, state.step, time.time() - t_start,
                             gen_s, window_rates, occupancies, starved,
                             partial=False)
    print(json.dumps(summary))
    return 0


def _write_summary(run_dir, step, total_s, gen_s, window_rates,
                   occupancies, starved, partial):
    import json
    import os
    import numpy as _np
    steady = window_rates[len(window_rates) // 2:] or window_rates
    summary = {
        "steps": int(step),
        "partial": bool(partial),
        "img_per_sec_steady": round(float(_np.mean(steady)), 3)
        if steady else None,
        "gen_duty_cycle": round(gen_s / max(total_s, 1e-9), 4),
        "total_wall_s": round(total_s, 1),
        "buffer_min": int(min(occupancies)) if occupancies else 0,
        "buffer_mean": round(float(_np.mean(occupancies)), 1)
        if occupancies else 0,
        "starved_steps": starved,
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


if __name__ == "__main__":
    raise SystemExit(main())
