"""CI-scale online training: generate-on-device -> ring buffer -> train.

The reference's online recipe is a 32k-step single-V100 headline
(README.md:74-86). This runs the same interleaved loop at toy scale on the
CPU mesh and asserts the loop's health invariants: no buffer starvation,
generator actually feeding, finite losses, summary JSON emitted. The
sustained TPU run is recorded in docs/ONLINE.md.
"""
import json
import os

import numpy as np
import pytest


@pytest.mark.timeout(900)
def test_online_loop_ci_scale(tmp_path, capsys):
    from mpiflow_tpu.cli.quality_loop import synthesize_base
    from mpiflow_tpu.cli import train_online

    base = str(tmp_path / "base")
    synthesize_base(base, n_images=3, height=96, width=160, seed=3)

    rc = train_online.main([
        "--base", base, "--width", "160", "--height", "96",
        "--planes", "6", "--repeat", "2", "--predictor", "geometric",
        "--small", "--num_steps", "100", "--batch_size", "2",
        "--image_size", "64", "96", "--iters", "2",
        "--buffer", "64", "--gen_every", "10", "--warmup_images", "2",
        "--val_freq", "50",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--run_dir", str(tmp_path / "run"),
        "--name", "online-ci",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["steps"] == 100
    assert summary["starved_steps"] == 0, summary
    assert summary["buffer_min"] >= 2, summary
    assert summary["img_per_sec_steady"] is not None
    assert 0.0 < summary["gen_duty_cycle"] < 1.0, summary

    # the JSONL trail carries train metrics AND online-health records
    lines = [json.loads(l) for l in
             open(os.path.join(tmp_path, "run", "metrics.jsonl"))]
    splits = {l["split"] for l in lines}
    assert "train" in splits and "online" in splits
    train_recs = [l for l in lines if l["split"] == "train"]
    assert np.isfinite([r["loss"] for r in train_recs]).all()
    online_recs = [l for l in lines if l["split"] == "online"]
    assert all(r["buffer"] >= 2 for r in online_recs)

    # final checkpoint written, plus the periodic val_freq snapshots a
    # long run needs to survive a host OOM-kill (docs/ONLINE.md)
    assert os.path.exists(os.path.join(tmp_path, "ckpt", "online-ci.npz"))
    for step in (50, 100):
        assert os.path.exists(
            os.path.join(tmp_path, "ckpt", f"{step}_online-ci.npz"))
