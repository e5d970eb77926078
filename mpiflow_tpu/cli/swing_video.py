"""Render a 3D-photo swing video from a single image (the reference's
gen_swing_path capability, utils/utils.py:55-62 + render_novel_view).

  python -m mpiflow_tpu.cli.swing_video --image img.png --disp disp.png \
      --out swing/ --frames 90 --planes 32 --width 640 --height 384
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--disp", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--planes", type=int, default=32)
    p.add_argument("--frames", type=int, default=90)
    p.add_argument("--r_x", type=float, default=0.14)
    p.add_argument("--r_y", type=float, default=0.0)
    p.add_argument("--r_z", type=float, default=0.10)
    p.add_argument("--ckpt_path", default=None,
                   help="optional AdaMPI checkpoint; geometric MPI otherwise")
    args = p.parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    import jax
    import jax.numpy as jnp
    from mpiflow_tpu.geom.camera import make_intrinsics
    from mpiflow_tpu.geom.homography import mpi_plane_disparities
    from mpiflow_tpu.io.image import load_image, load_disparity, save_image_u8, to_u8
    from mpiflow_tpu.models.geometric import geometric_mpi
    from mpiflow_tpu.motion.pose import gen_swing_path
    from mpiflow_tpu.ops.resample import resize_bilinear_align_corners
    from mpiflow_tpu.render.mpi import render_novel_view

    H, W = args.height, args.width
    K = jnp.asarray(make_intrinsics(W, H))
    disparities = jnp.asarray(mpi_plane_disparities(args.planes))

    img = resize_bilinear_align_corners(
        jnp.asarray(load_image(args.image).transpose(2, 0, 1)), H, W)
    disp = resize_bilinear_align_corners(
        jnp.asarray(load_disparity(args.disp))[None], H, W)[0]

    if args.ckpt_path:
        from mpiflow_tpu.models.adampi import load_adampi_predictor
        predict = load_adampi_predictor(args.ckpt_path, W, H)
        mpi_rgb, mpi_sigma = predict(img, disp)
    else:
        mpi_rgb, mpi_sigma = geometric_mpi(img, disp, disparities)

    @jax.jit
    def render_frame(G):
        out = render_novel_view(mpi_rgb, mpi_sigma, disparities, G, K, K,
                                src_img=img)
        return out.frame

    os.makedirs(args.out, exist_ok=True)
    poses = gen_swing_path(args.frames, args.r_x, args.r_y, args.r_z)
    for i, G in enumerate(poses):
        frame = np.asarray(render_frame(jnp.asarray(G)))
        save_image_u8(os.path.join(args.out, f"frame_{i:04d}.png"),
                      to_u8(frame.transpose(1, 2, 0)))
    print(f"wrote {len(poses)} frames to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
