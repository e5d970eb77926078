"""Flow-distribution statistics for generated pair sets.

Prints per-set flow-magnitude stats (mean / p99 / max over a sample of
.flo files). Used to diagnose the round-5 headline full-loop table: the
downstream RAFT result of each predictor variant is governed by how well
its generated flow-magnitude distribution matches the held-out val set
(see docs/ROUND5.md "Results"). Reference context: the reference's data
quality likewise depends on its pretrained AdaMPI's disparity placement
(gen_3dphoto_dynamic_v2.py predict -> render chain).

Usage:
  python tools/analyze_pairs.py runs/full_loop_headline/loop_*/pairs_train \
      runs/full_loop_headline/pairs_val_common
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpiflow_tpu.io.flo import read_flo  # noqa: E402


def stats_for(pair_dir: str, limit: int) -> dict | None:
    flow_dir = os.path.join(pair_dir, "flows")
    files = sorted(glob.glob(os.path.join(flow_dir, "*.flo")))
    if not files:
        return None
    per_file = []
    for f in files[:limit]:
        mag = np.linalg.norm(read_flo(f), axis=-1)
        per_file.append((mag.mean(), np.percentile(mag, 99), mag.max()))
    arr = np.array(per_file)
    return {
        "n_files": len(files),
        "n_sampled": len(per_file),
        "mean_mag": float(arr[:, 0].mean()),
        "p99_mag": float(arr[:, 1].mean()),
        "max_mag": float(arr[:, 2].max()),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pair_dirs", nargs="+",
                    help="dirs containing a flows/ subdir of .flo files")
    ap.add_argument("--limit", type=int, default=40,
                    help="max .flo files sampled per dir")
    args = ap.parse_args(argv)
    for d in args.pair_dirs:
        s = stats_for(d, args.limit)
        if s is None:
            print(f"{d}: no flows")
            continue
        print(f"{d}: n={s['n_files']} mean|f|={s['mean_mag']:.2f}px "
              f"p99={s['p99_mag']:.2f}px max={s['max_mag']:.1f}px")


if __name__ == "__main__":
    main()
