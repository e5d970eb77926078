#!/usr/bin/env bash
# Headline-scale full-loop supervisor (round 5, final session).
#
# The round-5 product run lost its (gitignored) work dir to a third VM
# restart with ~1h of round left; product scale needs ~2.5h of chip time
# (EC 1842s + AdaMPI 2900s + 3x RAFT 2000 steps) and cannot land. This
# runs the SAME three-variant loop at the SAME product geometry
# (384x1280, 64 planes, full RAFT, 288x960 crop, 12 iters) with step
# budgets sized from the measured stage rates to finish in ~50 min --
# a complete table beats a product-scale stub.
#
# NOTE: do NOT enable the JAX persistent compilation cache here. With
# JAX_COMPILATION_CACHE_DIR set, the first attempt hung for 18+ min
# before its first compile finished (empty cache dir, process futex-
# blocked, zero device work) on the experimental axon backend; the same
# stage reaches its first training step in ~7 min without it.
set -u
WORK=${1:-/root/repo/runs/full_loop_headline}
REPO=/root/repo
EVID=$REPO/docs/evidence
LOG=$REPO/logs/full_loop_headline.log
mkdir -p "$WORK" "$EVID" "$REPO/logs"

mirror() {
  [ -f "$WORK/full_loop.json" ] && cp "$WORK/full_loop.json" \
      "$EVID/full_loop_headline.json"
  tail -c 262144 "$LOG" > "$EVID/full_loop_headline_tail.log" 2>/dev/null
}

( while true; do mirror; sleep 60; done ) &
MIRROR_PID=$!
trap 'kill $MIRROR_PID 2>/dev/null' EXIT

for attempt in $(seq 1 40); do
  echo "=== full_loop headline attempt $attempt $(date -u +%FT%TZ) ===" \
      >> "$LOG"
  # Deadline-fit overrides (the cache-hang false start cost 18 min of a
  # ~50-min window): skip EC training for the stage-2 inpainter (the
  # diffusion inpainter is the framework's native op; EC training at
  # product scale is separately evidenced in logs/full_loop_product.log),
  # and run the decisive adampi_random-vs-adampi_trained pair FIRST so a
  # deadline cut still lands the trained-beats-random comparison.
  python "$REPO/tools/full_loop.py" --work_dir "$WORK" --scale headline \
      --ec_steps 0 --adampi_steps 120 --scenes 32 --raft_steps 200 \
      --variants adampi_random adampi_trained geometric \
      >> "$LOG" 2>&1
  rc=$?
  mirror
  if [ $rc -eq 0 ]; then
    echo "=== full_loop headline DONE $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $attempt exited rc=$rc; retrying in 30s ===" >> "$LOG"
  sleep 30
done
echo "=== full_loop headline GAVE UP after 40 attempts ===" >> "$LOG"
exit 1
