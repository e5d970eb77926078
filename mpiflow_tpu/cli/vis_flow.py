"""Visual sanity check of generated datasets (reference: vis_flow.py).

Reads {src_images,dst_images,flows} triplets, draws sampled flow
correspondences across the stacked pair plus a flow colorization, writes to
--out (default vis/).

  python -m mpiflow_tpu.cli.vis_flow --data out/kitti --out vis --limit 10
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", default="vis")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--lines", type=int, default=30)
    args = p.parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    from PIL import Image
    from mpiflow_tpu.io.flo import read_flo
    from mpiflow_tpu.viz.montage import vis_flow_pair, sample_montage

    os.makedirs(args.out, exist_ok=True)
    flows = sorted(glob.glob(os.path.join(args.data, "flows", "*.flo")))
    for path in flows[: args.limit]:
        key = os.path.splitext(os.path.basename(path))[0]
        src = np.asarray(Image.open(
            os.path.join(args.data, "src_images", key + ".png")))
        dst = np.asarray(Image.open(
            os.path.join(args.data, "dst_images", key + ".png")))
        flow = read_flo(path)
        pair = vis_flow_pair(src, dst, flow, n_lines=args.lines)
        montage = sample_montage(src, dst, flow)
        Image.fromarray(pair).save(os.path.join(args.out, key + "_pair.png"))
        Image.fromarray(montage).save(
            os.path.join(args.out, key + "_montage.png"))
        print(key, "flow range",
              np.round(flow.min(), 2), np.round(flow.max(), 2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
