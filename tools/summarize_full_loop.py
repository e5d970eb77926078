#!/usr/bin/env python
"""Render a full_loop.json (tools/full_loop.py output) as the docs table.

Usage: python tools/summarize_full_loop.py runs/full_loop_r5/full_loop.json

Mirrors the structure of the reference's README.md:94-105 checkpoints
table: one row per generated-dataset variant, graded on one shared
held-out val set (EPE / >3px), plus the best-variant extension row.
"""
import json
import sys


def main(path):
    with open(path) as f:
        t = json.load(f)
    p = t.get("params", {})
    stages = t.get("stages", {})
    lines = []
    lines.append(
        f"Scale `{t.get('scale')}`: {p.get('scenes')} scenes at "
        f"{p.get('gh')}x{p.get('gw')}, {p.get('planes')} planes, repeat "
        f"{p.get('repeat')} -> {p.get('scenes', 0) * p.get('repeat', 0)} "
        f"pairs per variant; RAFT {p.get('raft_steps')} steps, batch "
        f"{p.get('raft_batch')}, {p.get('iters')} iters (eval "
        f"{p.get('eval_iters')}); AdaMPI {p.get('adampi_steps')} steps "
        f"at {p.get('ah')}x{p.get('aw')} batch {p.get('adampi_batch')}; "
        f"EdgeConnect {p.get('ec_steps')} steps.")
    lines.append("")
    lines.append("| dataset variant | held-out EPE (init -> final) | "
                 ">3px final | train s |")
    lines.append("|---|---|---|---|")

    def row(name, s):
        if not s or "epe_final" not in s:
            return f"| {name} | (pending) | | |"
        return (f"| {name} | {s.get('epe_init', float('nan')):.2f} -> "
                f"**{s['epe_final']:.2f}** | {s['3px_final']:.3f} | "
                f"{s.get('seconds', 0):.0f} |")

    for v in ("geometric", "adampi_random", "adampi_trained"):
        lines.append(row(v, stages.get(f"loop_{v}")))
    for k in stages:
        if k.startswith("extend_"):
            lines.append(row(f"{k[7:]} (extended to "
                             f"{p.get('extend_best')} steps)", stages[k]))
    if "trained_beats_random" in t:
        lines.append("")
        lines.append(f"trained_beats_random: "
                     f"**{t['trained_beats_random']}**")
    print("\n".join(lines))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "runs/full_loop_r5/full_loop.json")
