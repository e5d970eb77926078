"""Structured training metrics: step-keyed JSONL + optional TensorBoard.

Equivalent of the reference's Logger (RAFT/train.py:89-133): 100-step
running means of the training metrics printed AND persisted, eval dicts
recorded at validation points, plus throughput and learning rate. The JSONL
sink (`metrics.jsonl` under the run directory) is the durable artifact --
one JSON object per line:

  {"step": 100, "split": "train", "loss": ..., "epe": ..., "lr": ...,
   "img_per_sec": ...}
  {"step": 5000, "split": "val", "kitti-epe": ..., "kitti-f1": ...}

TensorBoard event files are written too when the `tensorboard` package is
importable (the reference writes TB scalars; this environment may not ship
it, so it's best-effort).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    """Aggregates running means every `sum_freq` steps and writes JSONL.

    Mirrors the reference Logger's push/print cadence (RAFT/train.py:99-121)
    with a persistent sink instead of print-only.
    """

    def __init__(self, run_dir: Optional[str] = None, sum_freq: int = 100,
                 print_fn=print):
        self.sum_freq = sum_freq
        self.print_fn = print_fn
        self.running: Dict[str, float] = {}
        self.count = 0
        self._t0 = time.time()
        self._imgs = 0
        self._fh = None
        self._tb = None
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            self._fh = open(os.path.join(run_dir, "metrics.jsonl"), "a",
                            buffering=1)
            try:  # best-effort TB (the reference writes TB scalars)
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=run_dir)
            except Exception:
                self._tb = None

    def push(self, step: int, metrics: Dict[str, float], batch_size: int,
             lr: Optional[float] = None) -> None:
        """Per-step training metrics; emits aggregated record every
        sum_freq steps."""
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        self.count += 1
        self._imgs += batch_size
        if step % self.sum_freq != 0:
            return
        dt = max(time.time() - self._t0, 1e-9)
        rec = {"step": step, "split": "train"}
        rec.update({k: self.running[k] / self.count
                    for k in sorted(self.running)})
        if lr is not None:
            rec["lr"] = float(lr)
        rec["img_per_sec"] = self._imgs / dt
        self._emit(rec)
        msg = f"[{step:6d}] " + ", ".join(
            f"{k}={rec[k]:.4f}" for k in sorted(self.running))
        self.print_fn(f"{msg}  ({rec['img_per_sec']:.1f} img/s)")
        self.running = {}
        self.count = 0
        self._imgs = 0
        self._t0 = time.time()

    def write_dict(self, step: int, results: Dict[str, float],
                   split: str = "val") -> None:
        """Eval-dict record (reference Logger.write_dict, train.py:123-130)."""
        rec = {"step": step, "split": split}
        rec.update({k: float(v) for k, v in results.items()})
        self._emit(rec)
        self.print_fn(str(results))

    def _emit(self, rec: Dict) -> None:
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k != "step":
                    self._tb.add_scalar(f"{rec['split']}/{k}", v, rec["step"])

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
