"""Train the EdgeConnect stage-1 inpainter trio on warpback triples.

The reference loads pretrained `ecweight/*.pth` (warpback/networks.py:11-26)
and ships no trainer; this CLI trains all three generators (edge, RGB
inpaint, disparity inpaint) adversarially on WarpbackStage1 (image, disp,
hole-mask) triples and writes one npz checkpoint in the exact ec_params
layout the stage-2 synthesizer consumes (see train/edgeconnect_train.py for
the loss recipe and documented deviations).

  python -m mpiflow_tpu.cli.train_edgeconnect --data_root data/warpback \
      --width 384 --height 256 --num_steps 2000 --batch_size 4 \
      --ckpt_out checkpoints/ec_trained.npz
"""
from __future__ import annotations

import argparse
import json
import logging
import os


def build_parser():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_root", default=None,
                   help="warpback image dir ({*.jpg,png} + dpt_depth/); "
                        "default: synthesize procedural scenes")
    p.add_argument("--synth_images", type=int, default=16,
                   help="synthesized scenes when --data_root is omitted")
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--models", nargs="+", default=["edge", "inpaint", "disp"],
                   choices=["edge", "inpaint", "disp"])
    p.add_argument("--num_steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_out", default="checkpoints/ec_trained.npz")
    p.add_argument("--run_dir", default="runs/edgeconnect")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--pool_per_scene", type=int, default=4,
                   help="pre-render this many stage-1 triples per scene "
                        "once and cycle them shuffled (0 = render a fresh "
                        "pose every sample; with the dual rgbd_render per "
                        "triple that costs ~0.8s/item of renderer dispatch "
                        "per step, 30x the train step itself)")
    return p


def _synth_warpback_dir(root: str, n: int, height: int, width: int,
                        seed: int):
    import numpy as np
    from PIL import Image
    from mpiflow_tpu.utils.synth import procedural_scene
    os.makedirs(os.path.join(root, "dpt_depth"), exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        img, disp, _ = procedural_scene(rng, height, width)
        Image.fromarray(
            np.clip(img * 255, 0, 255).astype(np.uint8)
        ).save(os.path.join(root, f"{i:04d}.jpg"))
        d16 = np.clip(disp, 0, 1) * (2 ** 16 - 1)
        Image.fromarray(d16.astype(np.uint16)).save(
            os.path.join(root, "dpt_depth", f"{i:04d}.png"))


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    import numpy as np
    import jax.numpy as jnp
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    from mpiflow_tpu.train.edgeconnect_train import (
        ECTrainer, save_ec_checkpoint)
    from mpiflow_tpu.train.logger import MetricsLogger
    from mpiflow_tpu.warpback.datasets import (WarpbackStage1,
                                               random_edgeconnect_params)

    data_root = args.data_root
    if data_root is None:
        data_root = os.path.join(args.run_dir, "synth_base")
        _synth_warpback_dir(data_root, args.synth_images, args.height,
                            args.width, args.seed)
    ds = WarpbackStage1(data_root, width=args.width, height=args.height,
                        seed=args.seed)
    if len(ds) == 0:
        raise SystemExit(f"no images under {data_root}")

    def fetch(idx):
        item = ds[idx % len(ds)]
        # fractional visibility -> the binary hole mask the
        # inference chain uses (inpaint_rgbd_batch's 0.5 cut)
        return (item["rgb"], item["disp"],
                (item["mask"] > 0.5).astype(np.float32))

    if args.pool_per_scene > 0:
        # Pre-render the whole triple pool once (each scene under
        # pool_per_scene independent warpback poses), then cycle it
        # shuffled. Built lazily on first use, shared by all three model
        # trainings below; the epoch-style reuse matches how EdgeConnect
        # itself trains on a fixed dataset.
        pool = []

        def batches():
            if not pool:
                import time as _time
                t0 = _time.time()
                pool.extend(fetch(i) for _ in range(args.pool_per_scene)
                            for i in range(len(ds)))
                logging.info("pre-rendered %d stage-1 triples in %.1fs",
                             len(pool), _time.time() - t0)
            order = np.random.RandomState(
                args.seed + 7).permutation(len(pool))
            j = 0
            while True:
                sel = [pool[order[(j + k) % len(pool)]]
                       for k in range(args.batch_size)]
                j += args.batch_size
                yield tuple(jnp.asarray(np.stack(xs)) for xs in zip(*sel))
    else:
        def batches():
            """Cycle stage-1 triples into [B,...] device batches."""
            idx = 0
            while True:
                sel = []
                for _ in range(args.batch_size):
                    sel.append(fetch(idx))
                    idx += 1
                yield tuple(jnp.asarray(np.stack(xs)) for xs in zip(*sel))

    init = random_edgeconnect_params(seed=args.seed)
    logger = MetricsLogger(args.run_dir, sum_freq=args.log_every,
                           print_fn=logging.info)
    trained = {}
    summaries = {}
    # per-model resume: a partial checkpoint holds every model trained so
    # far, so a restart skips completed models instead of restarting the
    # whole trio
    partial = args.ckpt_out + ".partial.npz"
    if os.path.exists(partial):
        from mpiflow_tpu.train.edgeconnect_train import load_ec_checkpoint
        done = load_ec_checkpoint(partial)
        trained.update(done)
        logging.info("resuming: %s already trained (from %s)",
                     sorted(done), partial)
    for kind in args.models:
        if kind in trained:
            summaries[kind] = {"resumed": True}
            continue
        trainer = ECTrainer(kind, lr=args.lr)
        state = trainer.init_state(init[kind], disc_seed=args.seed + 1)
        it = batches()
        first = last = None
        for _ in range(args.num_steps):
            rgb, disp, mask = next(it)
            metrics = trainer.run_step(state, rgb, disp, mask)
            metrics = {f"{kind}_{k}": float(v) for k, v in metrics.items()}
            logger.push(state.step, metrics, args.batch_size)
            if first is None:
                first = metrics
            last = metrics
        trained[kind] = state.gen_params
        summaries[kind] = {"first": first, "last": last,
                           "steps": state.step}
        save_ec_checkpoint(partial, trained)
    # models not trained this invocation keep their init so the
    # checkpoint is always a complete ec_params tree
    for kind in ("edge", "inpaint", "disp"):
        trained.setdefault(kind, init[kind])
    save_ec_checkpoint(args.ckpt_out, trained)
    logger.close()
    print(json.dumps({"ckpt": args.ckpt_out, "summaries": summaries}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
