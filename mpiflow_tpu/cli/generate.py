"""Dataset-generation CLI; flag-compatible with the reference entry point
(gen_3dphoto_dynamic_v2.py:20-34) plus TPU-native extensions.

The three reference entry-point flavors (gen_3dphoto_dynamic.py,
gen_3dphoto_dynamic_coco.py, gen_3dphoto_dynamic_v2.py -- the first two are
absent from the snapshot, see SURVEY.md) are exposed through --flavor.

Examples:
  python -m mpiflow_tpu.cli.generate --base data/kitti --out out/kitti \
      --width 1280 --height 384 --repeat 5 --seed 114514 --ext_cz 0.15
  python -m mpiflow_tpu.cli.generate --base data/coco --out out/coco \
      --flavor coco --predictor geometric
"""
from __future__ import annotations

import argparse
import json
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    # reference flags (gen_3dphoto_dynamic_v2.py:20-34)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--ext_cz", type=float, default=0.15)
    p.add_argument("--ckpt_path", type=str, default="adampiweight/adampi_64p.pth")
    p.add_argument("--repeat", type=int, default=5)
    p.add_argument("--base", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    # TPU-native extensions
    p.add_argument("--flavor", choices=["kitti_v2", "coco", "legacy"],
                   default="kitti_v2", help="pose-distribution flavor")
    p.add_argument("--predictor", choices=["adampi", "geometric"],
                   default="adampi",
                   help="MPI predictor: pretrained AdaMPI or network-free")
    p.add_argument("--allow_geometric_fallback", action="store_true",
                   help="with --predictor adampi, silently fall back to the "
                        "geometric MPI when the checkpoint can't be loaded "
                        "(default: abort, like the reference's hard torch.load "
                        "failure at gen_3dphoto_dynamic_v2.py:52-58)")
    p.add_argument("--bilateral", type=int, default=0, metavar="ITERS",
                   help="sparse-bilateral-filter the disparity for N "
                        "iterations before MPI prediction "
                        "(bilateral_filter.py:13-53 semantics; reference "
                        "keeps this off the live path, utils/utils.py:48)")
    p.add_argument("--planes", type=int, default=64)
    p.add_argument("--render_mode",
                   choices=["pallas", "preblocked", "quad", "scan",
                            "batched"],
                   default="pallas",
                   help="MPI warp strategy (see render/mpi.py; all "
                        "numerically identical -- pallas is fastest on "
                        "current TPUs and falls back to preblocked when "
                        "the backend can't compile the kernel)")
    p.add_argument("--inpaint", choices=["jax", "cv2_ns"], default="jax")
    p.add_argument("--warp_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="warp gather-table dtype: bfloat16 halves the "
                        "bytes-bound warp kernel's HBM traffic (the "
                        "reference renders from an fp16 model); "
                        "ground-truth flow is unaffected (analytic). "
                        "float32 = bit-exact parity with the oracle")
    p.add_argument("--rng", choices=["numpy", "jax"], default="numpy",
                   help="numpy = bit-parity with reference pose streams")
    p.add_argument("--limit", type=int, default=None,
                   help="process only the first N images")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard generation over N mesh devices (one image "
                        "per device per wave); 1 = single-chip")
    p.add_argument("--hosts", type=int, default=1,
                   help="multi-slice shape: hosts x data_parallel mesh "
                        "(\"host\" x \"data\" axes); --base then accepts "
                        "either one dir (round-robin split across hosts) "
                        "or a comma-separated dir per host; requires "
                        "--rng jax")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="report per-stage wall-clock means in the summary")
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler device trace of the run "
                        "into this dir (view with TensorBoard/XProf)")
    p.add_argument("--hard_flow", action="store_true")
    p.add_argument("--flow_viz", choices=["auto", "on", "off"],
                   default="auto",
                   help="write colorized mixed-flow PNGs under flow_viz/ "
                        "(auto = on for --flavor coco, matching "
                        "utils_coco.py:270-278)")
    return p


def make_config(args):
    from mpiflow_tpu.config import (GenConfig, PoseConfig, RenderConfig,
                                    InpaintConfig, DepthConfig)
    base_map = {"kitti_v2": (0.1, 0.1, 0.1), "coco": (0.1, 0.1, 0.1),
                "legacy": (0.05, 0.05, 0.05)}
    return GenConfig(
        width=args.width, height=args.height, seed=args.seed,
        repeat=args.repeat, ckpt_path=args.ckpt_path, base=args.base,
        out=args.out,
        pose=PoseConfig(flavor=args.flavor, ext_cz=args.ext_cz,
                        base_motions=base_map[args.flavor]),
        render=RenderConfig(num_planes=args.planes, hard_flow=args.hard_flow,
                            mode=args.render_mode,
                            warp_dtype=args.warp_dtype),
        inpaint=InpaintConfig(method=args.inpaint),
        depth=DepthConfig(bilateral_iters=args.bilateral),
        rng_mode=args.rng, resume=not args.no_resume,
        mesh_data_axis=args.data_parallel, mesh_host_axis=args.hosts,
        save_flow_viz={"auto": args.flavor == "coco",
                       "on": True, "off": False}[args.flow_viz])


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    cfg = make_config(args)

    # persistent compile cache: repeated CLI invocations skip XLA recompiles
    # (dir keyed by backend -- never share between axon/TPU and CPU)
    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    mpi_fn = None
    if args.predictor == "adampi":
        try:
            from mpiflow_tpu.models.adampi import load_adampi_predictor
            mpi_fn = load_adampi_predictor(args.ckpt_path, args.width,
                                           args.height)
        except (ImportError, FileNotFoundError, ValueError, KeyError) as e:
            if not args.allow_geometric_fallback:
                # Fail fast: generating a whole dataset with the low-fidelity
                # geometric MPI when the user asked for AdaMPI is a silent
                # quality regression (reference hard-fails at
                # gen_3dphoto_dynamic_v2.py:52-58).
                raise SystemExit(
                    f"error: --predictor adampi but checkpoint "
                    f"{args.ckpt_path!r} could not be loaded ({e}). Pass "
                    f"--predictor geometric or --allow_geometric_fallback "
                    f"to proceed without it.")
            logging.warning("AdaMPI predictor unavailable (%s); "
                            "falling back to geometric MPI", e)

    from mpiflow_tpu.pipeline import DatasetGenerator
    gen = DatasetGenerator(cfg, mpi_predict_fn=mpi_fn)
    base = (args.base.split(",") if args.hosts > 1 and "," in args.base
            else args.base)
    if args.trace_dir:
        from mpiflow_tpu.utils.profiling import device_profile
        with device_profile(args.trace_dir):
            stats = gen.run(base, args.out, limit=args.limit,
                            profile=args.profile)
    else:
        stats = gen.run(base, args.out, limit=args.limit,
                        profile=args.profile)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
