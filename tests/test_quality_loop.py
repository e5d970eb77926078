"""End-to-end quality loop on the CPU mesh: generate -> train -> eval.

This is the reference's definition of done (train RAFT on generated pairs,
measure flow error downstream -- RAFT/train_standard.sh:2-7) at CI scale:
a few procedural scenes, a short from-scratch RAFT-small fine-tune, EPE on
held-out generated pairs measured before and after.
"""
import json
import os

import pytest


@pytest.mark.parametrize("steps", [15])
def test_quality_loop_end_to_end(tmp_path, capsys, steps):
    from mpiflow_tpu.cli import quality_loop

    rc = quality_loop.main([
        "--work_dir", str(tmp_path),
        "--num_images", "2", "--val_images", "1",
        "--width", "128", "--height", "96", "--planes", "6",
        "--repeat", "2", "--num_steps", str(steps),
        "--batch_size", "2", "--small", "--iters", "4",
        "--eval_iters", "6", "--lr", "4e-4",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert summary["train_pairs"] == 4
    assert summary["val_pairs"] == 2
    # training must actually reduce the sequence loss...
    assert summary["loss_last"] < summary["loss_first"]
    # ...and generalize: EPE on held-out generated pairs improves over init
    assert summary["improved"], summary
    assert summary["epe_final"] < summary["epe_init"]
    # artifacts: checkpoints + persistent metric trail
    assert os.path.exists(tmp_path / "checkpoints" / "qloop.npz")
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")
