#!/usr/bin/env bash
# Complete the 2000-step online run (VERDICT r4 item #2) at the documented
# product shape (docs/ONLINE.md). Round 4 ran 400/2000 steps and stopped to
# free the chip; the VM restart then erased the checkpoints, so this run
# starts fresh and is supervised: on a crash it restarts from the newest
# periodic checkpoint with --resume_step (the step counter continues; the
# optimizer restarts, like the reference's --restore_ckpt), appending to
# the same metrics.jsonl. Evidence (metrics + summary) mirrors into
# docs/evidence every 2 min so a lost work dir can't erase the run again.
#
# If $1 is a pid, wait for it to exit first (queue behind the full-loop
# supervisor so the single chip is never contended).
set -u
REPO=/root/repo
RUN=$REPO/runs/online_r5
LOG=$REPO/logs/online_r5.log
EVID=$REPO/docs/evidence
mkdir -p "$RUN" "$REPO/logs" "$EVID"

if [ $# -ge 1 ] && [ -n "${1:-}" ]; then
  echo "waiting for pid $1 to exit before starting" >> "$LOG"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

mirror() {
  cp "$RUN/metrics.jsonl" "$EVID/online_r5_metrics.jsonl" 2>/dev/null
  cp "$RUN/summary.json" "$EVID/online_r5_summary.json" 2>/dev/null
  tail -c 65536 "$LOG" > "$EVID/online_r5_tail.log" 2>/dev/null
}
( while true; do mirror; sleep 120; done ) &
MIRROR_PID=$!
trap 'kill $MIRROR_PID 2>/dev/null' EXIT

cd "$REPO"
for attempt in $(seq 1 20); do
  RESUME=()
  newest=$(ls "$RUN/ckpt" 2>/dev/null | grep -E '^[0-9]+_online_r5\.npz$' \
           | sort -n | tail -1)
  [ -n "$newest" ] && RESUME=(--restore_ckpt "$RUN/ckpt/$newest" --resume_step)
  echo "=== online_r5 attempt $attempt $(date -u +%FT%TZ) resume=${newest:-none} ===" >> "$LOG"
  python -m mpiflow_tpu.cli.train_online \
    --base data/online_base --width 1280 --height 384 --planes 64 \
    --predictor adampi_random --flavor kitti_v2 --repeat 5 \
    --num_steps 2000 --batch_size 6 --image_size 288 960 --iters 12 \
    --buffer 600 --gen_every 4 --val_freq 200 --remat_gru \
    --name online_r5 --checkpoint_dir "$RUN/ckpt" --run_dir "$RUN" \
    "${RESUME[@]}" >> "$LOG" 2>&1
  rc=$?
  mirror
  if [ $rc -eq 0 ]; then
    echo "=== online_r5 DONE $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $attempt exited rc=$rc; retrying in 60s ===" >> "$LOG"
  sleep 60
done
exit 1
