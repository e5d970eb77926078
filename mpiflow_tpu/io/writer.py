"""Asynchronous dataset writer with resume support.

The reference writes each generated sample synchronously on the Python main
thread (gen_3dphoto_dynamic_v2.py:120-122), serializing disk I/O with TPU/GPU
compute. Here writes are queued to a background pool so the device never
waits on the filesystem; `existing_sample_keys` implements resume-by-existing-
file (output files are keyed `{name}_{r}`, SURVEY §5 failure-recovery note).

Output layout (bit-compatible with the reference):
    out/
      src_images/{name}_{r}.png
      dst_images/{name}_{r}.png
      flows/{name}_{r}.flo
      obj_mask/{name}_{r}.png     (optional)
      flow_viz/{name}_{r}.png     (optional; the COCO flavor's colorized
                                   mixed-flow side output, utils_coco.py:270-278)
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Optional, Set

import numpy as np

from mpiflow_tpu.io.flo import write_flo
from mpiflow_tpu.io.image import save_image_u8

SUBDIRS = ("src_images", "dst_images", "flows", "obj_mask")


def ensure_layout(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for sub in SUBDIRS:
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)


def existing_sample_keys(out_dir: str) -> Set[str]:
    """Keys `{name}_{r}` that already have all three mandatory outputs."""
    done = None
    for sub, ext in (("flows", ".flo"), ("src_images", ".png"), ("dst_images", ".png")):
        d = os.path.join(out_dir, sub)
        if not os.path.isdir(d):
            return set()
        keys = {f[: -len(ext)] for f in os.listdir(d) if f.endswith(ext)}
        done = keys if done is None else (done & keys)
    return done or set()


class AsyncSampleWriter:
    """Background-thread writer for generated (src, dst, flow[, mask]) samples."""

    def __init__(self, out_dir: str, num_threads: int = 4, queue_size: int = 64,
                 save_flow_viz: bool = False):
        ensure_layout(out_dir)
        self.out_dir = out_dir
        self.save_flow_viz = save_flow_viz
        if save_flow_viz:
            os.makedirs(os.path.join(out_dir, "flow_viz"), exist_ok=True)
        self._queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._errors: list = []
        self._threads = []
        for _ in range(max(1, num_threads)):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def _worker(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                self._queue.task_done()
                return
            try:
                key, src_u8, dst_u8, flow, mask_u8 = item
                flo_path = os.path.join(self.out_dir, "flows", key + ".flo")
                from mpiflow_tpu.io.native import flo_write_native
                if not flo_write_native(flo_path, flow):
                    write_flo(flo_path, flow)
                save_image_u8(os.path.join(self.out_dir, "src_images", key + ".png"), src_u8)
                save_image_u8(os.path.join(self.out_dir, "dst_images", key + ".png"), dst_u8)
                if mask_u8 is not None:
                    save_image_u8(os.path.join(self.out_dir, "obj_mask", key + ".png"), mask_u8)
                if self.save_flow_viz:
                    # colorized mixed flow (utils_coco.py:270-278); host-side
                    # in the writer pool so the device never waits on it
                    from mpiflow_tpu.viz.flow_viz import flow_to_color
                    save_image_u8(
                        os.path.join(self.out_dir, "flow_viz", key + ".png"),
                        flow_to_color(flow))
            except Exception as e:  # surfaced on close()
                self._errors.append((item[0] if item else "?", e))
            finally:
                self._queue.task_done()

    def put(self, key: str, src_u8: np.ndarray, dst_u8: np.ndarray,
            flow: np.ndarray, mask_u8: Optional[np.ndarray] = None) -> None:
        self._queue.put((key, np.asarray(src_u8), np.asarray(dst_u8),
                         np.asarray(flow, dtype=np.float32),
                         None if mask_u8 is None else np.asarray(mask_u8)))

    def close(self) -> None:
        self._queue.join()
        for _ in self._threads:
            self._queue.put(None)
        for t in self._threads:
            t.join()
        if self._errors:
            key, err = self._errors[0]
            raise RuntimeError(
                f"{len(self._errors)} sample write(s) failed; first: {key}: {err}")

    def __enter__(self) -> "AsyncSampleWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
