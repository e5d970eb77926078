#!/usr/bin/env python
"""Summarize an online-training run into the docs/ONLINE.md results block.

Reads {run_dir}/summary.json and {run_dir}/metrics.jsonl (the "online"
split records buffer occupancy / generator duty cycle / img-per-sec per
100-step window) and prints a ready-to-paste markdown section.

  python tools/summarize_online.py runs/online_r4
"""
import json
import os
import sys

import numpy as np


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/online_r4"
    try:
        with open(os.path.join(run_dir, "summary.json")) as f:
            summary = json.load(f)
    except FileNotFoundError:
        summary = None
    windows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("split") == "online":
                windows.append(rec)
    losses = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("split") == "train" and "loss" in rec:
                losses.append((rec.get("step", 0), rec["loss"]))

    if summary is None and windows:
        # partial run killed before any summary landed: reconstruct the
        # same fields from the per-window "online" records
        steady = [w["img_per_sec"] for w in windows[len(windows) // 2:]]
        summary = {
            "steps": max(w.get("step", 0) for w in windows),
            "partial": True,
            "img_per_sec_steady": round(float(np.mean(steady)), 3),
            "gen_duty_cycle": float(np.mean([w["gen_duty"]
                                             for w in windows])),
            "total_wall_s": None,
            "buffer_min": int(min(w["buffer"] for w in windows)),
            "buffer_mean": round(float(np.mean([w["buffer"]
                                                for w in windows])), 1),
            "starved_steps": None,
        }
    label = " — PARTIAL (killed before completion)" \
        if summary.get("partial") else ""
    print(f"Results (run dir `{run_dir}`, summary.json + "
          f"metrics.jsonl){label}:\n")
    print("| metric | value |")
    print("|---|---|")
    print(f"| steps completed | {summary['steps']} |")
    if summary.get("total_wall_s") is not None:
        print(f"| wall time | {summary['total_wall_s'] / 60:.1f} min |")
    print(f"| steady-state img/s (2nd-half windows) | "
          f"{summary['img_per_sec_steady']} |")
    print(f"| generator duty cycle | {summary['gen_duty_cycle']:.3f} |")
    print(f"| buffer occupancy min / mean | {summary['buffer_min']} / "
          f"{summary['buffer_mean']} |")
    if summary.get("starved_steps") is not None:
        print(f"| starved steps | {summary['starved_steps']} |")
    if windows:
        occ = [w["buffer"] for w in windows]
        rate = [w["img_per_sec"] for w in windows]
        print(f"| per-window img/s min/median/max | {min(rate):.2f} / "
              f"{float(np.median(rate)):.2f} / {max(rate):.2f} |")
        print(f"| buffer occupancy curve (first/mid/last window) | "
              f"{occ[0]} / {occ[len(occ) // 2]} / {occ[-1]} |")
    if losses:
        k = max(len(losses) // 10, 1)
        first = float(np.mean([l for _, l in losses[:k]]))
        last = float(np.mean([l for _, l in losses[-k:]]))
        print(f"| seq loss, first-10% mean -> last-10% mean | "
              f"{first:.3f} -> {last:.3f} |")


if __name__ == "__main__":
    main()
