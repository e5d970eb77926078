"""Convert torch checkpoints (.pth) to torch-free .npz parameter archives.

Supports the reference's published weights:
  * adampi_64p.pth / adampi_32p.pth  ({'num_planes','weight'})
  * raft-things.pth etc. (raw state dicts, nn.DataParallel-prefixed)
  * EdgeConnect {Inpainting,Edge}Model weights ({'generator'})

  python -m mpiflow_tpu.cli.convert_ckpt adampiweight/adampi_64p.pth \
      weights/adampi_64p.npz
"""
from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("src", help="torch .pth checkpoint")
    p.add_argument("dst", help="output .npz path")
    args = p.parse_args(argv)
    from mpiflow_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    from mpiflow_tpu.models.torch_convert import (
        load_torch_checkpoint, convert_state_dict, save_converted)
    ckpt = load_torch_checkpoint(args.src)
    num_planes = ckpt.get("num_planes")
    sd = ckpt.get("weight", ckpt.get("generator", ckpt))
    params = convert_state_dict(sd)
    save_converted(params, args.dst,
                   num_planes=int(num_planes) if num_planes else None)
    print(f"converted {len(params)} tensors -> {args.dst}"
          + (f" (num_planes={num_planes})" if num_planes else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
