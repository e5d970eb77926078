"""Warpback + object-motion debug renders.

Parity for the reference's hand-validation surface (SURVEY.md §4): the
`__main__` debug blocks of warpback/stage1_dataset.py:138-162 /
stage2_dataset.py:178-201 (render toy batches into debug/*.jpg) and
moving_obj.py:163-168 (the temp/res-*.png montage of the depthstillation
pipeline). The reference's warpback/toydata dir is absent from the
snapshot, so --data_root is optional: toy RGBD scenes are synthesized by
default.

  python -m mpiflow_tpu.cli.warpback_demo --out debug
  python -m mpiflow_tpu.cli.warpback_demo --out debug \
      --data_root warpback/toydata --num 4
"""
from __future__ import annotations

import argparse
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--out", default="debug")
    p.add_argument("--data_root", default=None,
                   help="dir of images + {dpt_depth}/ 16-bit disparity "
                        "pngs (warpback layout); default: synthesize")
    p.add_argument("--num", type=int, default=2)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_object_motion", action="store_true")
    return p


def synthesize_toydata(root: str, n: int, height: int, width: int,
                       seed: int) -> None:
    """Toy RGBD scenes in the warpback layout (image.png +
    dpt_depth/image.png uint16 disparity)."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "dpt_depth"), exist_ok=True)
    for i in range(n):
        low = rng.rand(8, 10, 3)
        img = np.asarray(Image.fromarray(
            (low * 255).astype(np.uint8)).resize((width, height),
                                                 Image.BILINEAR))
        disp = np.linspace(0.8, 0.2, height)[:, None] * np.ones(
            (height, width))
        y0, x0 = rng.randint(height // 4), rng.randint(width // 2)
        img = img.copy()
        img[y0:y0 + height // 3, x0:x0 + width // 4] = rng.randint(
            0, 255, 3)
        disp[y0:y0 + height // 3, x0:x0 + width // 4] = 0.9
        Image.fromarray(img).save(f"{root}/{i:03d}.png")
        Image.fromarray((disp * 65535).astype("uint16")).save(
            f"{root}/dpt_depth/{i:03d}.png")


def _grid(rows):
    """Stack rows of [H,W,3] u8 panels into one image."""
    import numpy as np
    return np.concatenate([np.concatenate(r, axis=1) for r in rows], axis=0)


def _u8(x):
    import numpy as np
    x = np.asarray(x)
    if x.ndim == 3 and x.shape[0] in (1, 3):
        x = x.transpose(1, 2, 0)
    if x.ndim == 2:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = np.tile(x, (1, 1, 3))
    if x.dtype != np.uint8:
        x = (np.clip(x, 0, 1) * 255).astype(np.uint8)
    return x


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    import numpy as np
    from PIL import Image

    os.makedirs(args.out, exist_ok=True)
    root = args.data_root
    if root is None:
        root = os.path.join(args.out, "toydata")
        synthesize_toydata(root, args.num, args.height, args.width,
                           args.seed)

    from mpiflow_tpu.warpback.datasets import WarpbackStage1, WarpbackStage2
    ds1 = WarpbackStage1(root, width=args.width, height=args.height,
                         seed=args.seed)
    ds2 = WarpbackStage2(root, width=args.width, height=args.height,
                         seed=args.seed)
    n = min(args.num, len(ds1))
    for i in range(n):
        s = ds1[i]
        # stage1_dataset.py:138-162 layout: original / warped / warped-back
        Image.fromarray(_grid([
            [_u8(s["rgb"]), _u8(s["disp"])],
            [_u8(s["warp_rgb"]), _u8(s["warp_disp"])],
            [_u8(s["warp_back_rgb"]), _u8(s["mask"])],
        ])).save(os.path.join(args.out, f"stage1_{i:03d}.jpg"))
        s = ds2[i]
        # stage2_dataset.py:178-201: inpainted src view vs original target
        Image.fromarray(_grid([
            [_u8(s["src_rgb"]), _u8(s["src_disp"])],
            [_u8(s["warp_rgb"]), _u8(s["warp_disp"])],
            [_u8(s["tgt_rgb"]), _u8(s["tgt_disp"])],
        ])).save(os.path.join(args.out, f"stage2_{i:03d}.jpg"))
    logging.info("wrote %d stage1/stage2 montages under %s", n, args.out)

    if not args.skip_object_motion:
        # moving_obj.py:163-168 five-row montage (temp/res-*.png)
        import random as pyrandom
        from mpiflow_tpu.geom.camera import make_intrinsics
        from mpiflow_tpu.motion.object_motion import moving_object_with_mask
        from mpiflow_tpu.viz.flow_viz import flow_to_color
        ds = WarpbackStage1(root, width=args.width, height=args.height)
        rgb, disp = ds.load_rgbd(0)
        rgb_u8 = _u8(np.asarray(rgb))
        mask = (np.asarray(disp) > 0.85).astype(np.uint8)
        if mask.sum() == 0:
            mask[args.height // 3:args.height // 2,
                 args.width // 3:args.width // 2] = 1
        K = make_intrinsics(args.width, args.height)
        out = moving_object_with_mask(rgb_u8, np.asarray(disp), np.asarray(K),
                                      mask, pyrandom.Random(args.seed))
        Image.fromarray(_grid([
            [rgb_u8, _u8(out["im1_raw"])],
            [_u8(out["im1"]), _u8(flow_to_color(out["flow"]))],
            [_u8(out["H"].astype(np.float32)),
             _u8(out["P"].astype(np.float32))],
        ])).save(os.path.join(args.out, "object_motion.jpg"))
        logging.info("wrote object-motion montage")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
