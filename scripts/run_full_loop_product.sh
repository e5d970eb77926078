#!/usr/bin/env bash
# Product-scale full-loop supervisor (VERDICT r4 item #1).
#
# The round-5 attempts died twice to VM restarts mid-stage; every stage is
# now crash-resumable (EC per-model partial ckpt, AdaMPI periodic ckpt +
# --start_step, generation resume-by-existing-key, RAFT orbax full-state
# resume), so the recovery story is simply "run it again". This wrapper
# does that: restart on non-zero exit with a backoff, and mirror the
# incrementally-updated table + log into docs/evidence so progress is
# committable even if the work dir (gitignored) is lost.
#
# Usage: scripts/run_full_loop_product.sh [work_dir]
set -u
WORK=${1:-/root/repo/runs/full_loop_r5}
REPO=/root/repo
EVID=$REPO/docs/evidence
LOG=$REPO/logs/full_loop_product.log
mkdir -p "$WORK" "$EVID" "$REPO/logs"

mirror() {
  [ -f "$WORK/full_loop.json" ] && cp "$WORK/full_loop.json" \
      "$EVID/full_loop_product.json"
  tail -c 262144 "$LOG" > "$EVID/full_loop_product_tail.log" 2>/dev/null
}

( while true; do mirror; sleep 120; done ) &
MIRROR_PID=$!
trap 'kill $MIRROR_PID 2>/dev/null' EXIT

for attempt in $(seq 1 40); do
  echo "=== full_loop product attempt $attempt $(date -u +%FT%TZ) ===" \
      >> "$LOG"
  python "$REPO/tools/full_loop.py" --work_dir "$WORK" --scale product \
      >> "$LOG" 2>&1
  rc=$?
  mirror
  if [ $rc -eq 0 ]; then
    echo "=== full_loop product DONE $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $attempt exited rc=$rc; retrying in 60s ===" >> "$LOG"
  sleep 60
done
echo "=== full_loop product GAVE UP after 40 attempts ===" >> "$LOG"
exit 1
