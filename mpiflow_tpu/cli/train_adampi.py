"""Train (or fine-tune) the AdaMPI MPI predictor on warpback stage-2 pairs.

The missing third trainer: the reference ships AdaMPI inference weights
only, plus the warpback stage-2 pipeline that exists to synthesize its
training pairs (warpback/stage2_dataset.py, SURVEY.md §2.2). This CLI
closes that loop on TPU:

  RGBD scenes -> stage-2 synthesis (fused batch: mesh-render -> inpaint,
  warpback/datasets.make_stage2_synthesizer) -> AdaMPI forward on the
  inpainted novel view -> fused MPI render at the warp-back pose ->
  reconstruction losses vs the original view (train/adampi_train.py).

Data sources:
  * --data_root DIR     warpback layout: DIR/*.jpg|png + DIR/dpt_depth/*.png
                        (16-bit disparity), as the reference's stage
                        datasets consume (stage1_dataset.py:37-49);
  * default             procedural RGBD scenes (utils/synth.py), fully
                        self-contained — the same family the quality loop
                        trains RAFT on.

Checkpoints are converted-layout .npz archives; pass one straight to the
generation pipeline (`cli/generate.py --ckpt_path ckpt.npz`) or fine-tune
the published adampi_64p.pth via --restore_ckpt.

Example (CI-scale smoke; H and W must be divisible by 128 -- the
decoder's receptive-field extension, decoder.py:127-131):
  python -m mpiflow_tpu.cli.train_adampi --work_dir /tmp/adampi_train \
      --width 128 --height 128 --planes 8 --num_steps 30 --batch_size 2
"""
from __future__ import annotations

import argparse
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work_dir", required=True)
    p.add_argument("--data_root", default=None,
                   help="warpback-layout image dir (default: procedural)")
    p.add_argument("--depth_dir_name", default="dpt_depth")
    p.add_argument("--num_images", type=int, default=24,
                   help="procedural scenes when --data_root is absent")
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--planes", type=int, default=64)
    p.add_argument("--plane_chunk", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wdecay", type=float, default=1e-5)
    p.add_argument("--w_rgb", type=float, default=1.0)
    p.add_argument("--w_ssim", type=float, default=1.0)
    p.add_argument("--w_disp", type=float, default=1.0)
    p.add_argument("--inpainter", choices=("diffusion", "edgeconnect_random"),
                   default="diffusion",
                   help="stage-2 hole filling: harmonic diffusion, or the "
                        "EdgeConnect trio at random published-layout weights")
    p.add_argument("--ec_ckpt", default=None,
                   help="trained EdgeConnect .npz (cli/train_edgeconnect) "
                        "for the stage-2 inpainter; overrides --inpainter")
    p.add_argument("--trans_x", type=float, default=0.2,
                   help="warpback pose x-translation range (rand_tensor r)")
    p.add_argument("--pool_per_scene", type=int, default=0,
                   help="pre-render this many stage-2 pairs per scene once "
                        "and cycle them, instead of synthesizing per step "
                        "(same lever as train_edgeconnect --pool_per_scene: "
                        "synthesis costs several seconds per batch on the "
                        "tunneled chip, dominating the step). 0 = per-step "
                        "synthesis (fresh poses every step)")
    p.add_argument("--restore_ckpt", default=None,
                   help=".pth or .npz AdaMPI checkpoint to fine-tune")
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--start_step", type=int, default=0,
                   help="resume step counter (with --restore_ckpt on a "
                        "periodic checkpoint): trains num_steps-start_step "
                        "more steps, checkpoint names stay absolute. The "
                        "optimizer and data RNG restart, like the "
                        "reference's --restore_ckpt behavior")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the batch over an n-device mesh (0 = all)")
    return p


def load_scenes(args):
    """-> (rgb [N,3,H,W] f32 in [0,1], disp [N,H,W] f32)."""
    import numpy as np
    if args.data_root:
        from mpiflow_tpu.warpback.datasets import _WarpbackBase
        ds = _WarpbackBase(args.data_root, width=args.width,
                           height=args.height,
                           depth_dir_name=args.depth_dir_name,
                           seed=args.seed)
        if not len(ds):
            raise FileNotFoundError(
                f"no .jpg/.png images under {args.data_root}")
        pairs = [ds.load_rgbd(i) for i in range(len(ds))]
        rgb = np.stack([np.asarray(r) for r, _ in pairs])
        disp = np.stack([np.asarray(d) for _, d in pairs])
    else:
        from mpiflow_tpu.utils.synth import procedural_scene
        rng = np.random.RandomState(args.seed)
        imgs, disps = [], []
        for _ in range(args.num_images):
            img, dsp, _ = procedural_scene(rng, args.height, args.width)
            imgs.append(img.transpose(2, 0, 1))
            disps.append(dsp)
        rgb, disp = np.stack(imgs), np.stack(disps)
    return rgb.astype(np.float32), disp.astype(np.float32)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.height % 128 or args.width % 128:
        raise SystemExit("--height/--width must be divisible by 128 (the "
                         "decoder's receptive-field extension pools twice "
                         "below the H/32 scale and upsamples back)")
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    import numpy as np
    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from mpiflow_tpu.parallel.mesh import make_mesh
    from mpiflow_tpu.train.adampi_train import (
        AdaMPITrainConfig, he_adampi_params, make_adampi_optimizer,
        make_adampi_train_step, pixel_intrinsics)
    from mpiflow_tpu.train.logger import MetricsLogger
    from mpiflow_tpu.warpback.datasets import (
        K_NORM, make_stage2_synthesizer, random_edgeconnect_params,
        sample_warpback_pose, DEFAULT_TRANS_RANGE)

    os.makedirs(args.work_dir, exist_ok=True)
    cfg = AdaMPITrainConfig(
        num_planes=args.planes, plane_chunk=args.plane_chunk, lr=args.lr,
        wdecay=args.wdecay, num_steps=args.num_steps,
        batch_size=args.batch_size, w_rgb=args.w_rgb, w_ssim=args.w_ssim,
        w_disp=args.w_disp, seed=args.seed)

    # ---- data ----------------------------------------------------------
    rgb_all, disp_all = load_scenes(args)
    logging.info("scenes: %s", rgb_all.shape)
    if args.ec_ckpt:
        from mpiflow_tpu.train.edgeconnect_train import load_ec_checkpoint
        ec = load_ec_checkpoint(args.ec_ckpt)
        logging.info("stage-2 inpainter: trained EdgeConnect %s",
                     args.ec_ckpt)
    else:
        ec = (random_edgeconnect_params(args.seed)
              if args.inpainter == "edgeconnect_random" else None)
    synth = make_stage2_synthesizer(ec)
    trans_range = dict(DEFAULT_TRANS_RANGE, x=args.trans_x)

    # ---- params --------------------------------------------------------
    if args.restore_ckpt:
        from mpiflow_tpu.models.torch_convert import (load_torch_checkpoint,
                                                      convert_state_dict)
        ckpt = load_torch_checkpoint(args.restore_ckpt)
        sd = ckpt.get("weight", ckpt)
        if args.restore_ckpt.endswith(".npz"):
            params = {k: jnp.asarray(v) for k, v in sd.items()
                      if not k.endswith("num_batches_tracked")}
        else:
            params = {k: jnp.asarray(v)
                      for k, v in convert_state_dict(sd).items()}
        logging.info("restored %d tensors from %s", len(params),
                     args.restore_ckpt)
    else:
        params = he_adampi_params(args.seed)
        logging.info("he-initialized %d tensors at the published layout",
                     len(params))

    # ---- step ----------------------------------------------------------
    import math
    if args.data_parallel:
        n_dev = args.data_parallel
        if args.batch_size % n_dev:
            raise SystemExit(f"batch_size {args.batch_size} not divisible "
                             f"by --data_parallel {n_dev}")
    else:  # largest device count that divides the batch
        n_dev = math.gcd(args.batch_size, len(jax.devices()))
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    logging.info("mesh: %d device(s)", n_dev)
    tx = make_adampi_optimizer(cfg)
    K_pix = pixel_intrinsics(K_NORM, args.height, args.width)
    step_fn = make_adampi_train_step(cfg, tx, K_pix, mesh=mesh)
    opt_state = tx.init(params)

    def shard(x):
        if mesh is None or n_dev == 1:
            return jnp.asarray(x)
        from mpiflow_tpu.parallel.mesh import shard_batch
        return shard_batch(mesh, x)

    rng = np.random.RandomState(args.seed + 1)

    # ---- optional pre-rendered pair pool --------------------------------
    # Deterministic under resume: the pool build consumes rng first in the
    # same order every run, so a --start_step restart cycles the identical
    # pool the original run trained on.
    pool = None
    if args.pool_per_scene > 0:
        import time
        t0 = time.time()
        order = np.repeat(np.arange(rgb_all.shape[0]), args.pool_per_scene)
        B = args.batch_size
        pad = (-len(order)) % B
        if pad:
            order = np.concatenate([order, order[:pad]])
        keys = ("src_rgb", "src_disp", "tgt_rgb", "tgt_disp")
        buf = {k: [] for k in keys}
        exts = []
        for s in range(0, len(order), B):
            idx = order[s:s + B]
            poses = [sample_warpback_pose(rng, trans_range) for _ in idx]
            exts.append(np.stack([p[1] for p in poses]))
            out = synth(jnp.asarray(rgb_all[idx]),
                        jnp.asarray(disp_all[idx]),
                        jnp.asarray(np.stack([p[0] for p in poses])))
            for k in keys:
                buf[k].append(np.asarray(out[k]))
        pool = {k: np.concatenate(v) for k, v in buf.items()}
        pool["ext_back"] = np.concatenate(exts)
        logging.info("pre-rendered %d stage-2 pairs in %.1fs",
                     len(pool["ext_back"]), time.time() - t0)

    logger = MetricsLogger(args.work_dir, sum_freq=100,
                           print_fn=logging.info)
    ckpt_dir = os.path.join(args.work_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    from mpiflow_tpu.models.torch_convert import save_converted

    def save(step):
        flat = {k: np.asarray(v, np.float32) for k, v in params.items()}
        save_converted(flat, os.path.join(ckpt_dir, f"{step}_adampi.npz"),
                       num_planes=cfg.num_planes)

    for i in range(args.start_step, args.num_steps):
        if pool is not None:
            idx = rng.randint(0, pool["ext_back"].shape[0],
                              size=args.batch_size)
            batch = {k: pool[k][idx] for k in
                     ("src_rgb", "src_disp", "tgt_rgb", "tgt_disp")}
            ext_back = pool["ext_back"][idx]
        else:
            idx = rng.randint(0, rgb_all.shape[0], size=args.batch_size)
            # forward pose warps the original to the novel view; its
            # inverse is the warp-back render pose (WarpbackStage2
            # cam_ext semantics)
            poses = [sample_warpback_pose(rng, trans_range)
                     for _ in range(args.batch_size)]
            ext_fwd = np.stack([p[0] for p in poses])
            ext_back = np.stack([p[1] for p in poses])
            batch = synth(jnp.asarray(rgb_all[idx]),
                          jnp.asarray(disp_all[idx]),
                          jnp.asarray(ext_fwd))
        params, opt_state, metrics = step_fn(
            params, opt_state, shard(batch["src_rgb"]),
            shard(batch["src_disp"]), shard(batch["tgt_rgb"]),
            shard(batch["tgt_disp"]), shard(jnp.asarray(ext_back)))
        if i == 0:
            logging.info("[%6d] first step done, loss=%.4f", i + 1,
                         float(metrics["loss"]))
        logger.push(i + 1, metrics, args.batch_size)
        if (i + 1) % args.ckpt_every == 0:
            save(i + 1)
    save(args.num_steps)
    logger.close()
    logging.info("final checkpoint: %s/%d_adampi.npz (pass as --ckpt_path "
                 "to cli.generate)", ckpt_dir, args.num_steps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
