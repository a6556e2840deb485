#!/bin/bash
# Beyond-flickr scale ladder on the one real chip: 31k sanity check,
# then 524k and 1M full pipelines (bf16 feature storage past the f32
# HBM ceiling), each with crash-resume state under MMUMAP_LADDER_DIR
# (default <repo>/.ladder, gitignored: /tmp is wiped between build
# rounds and round 3 lost its 1M graph snapshots exactly that way).
# If you point MMUMAP_LADDER_DIR anywhere else, keep it OUTSIDE the
# repo (or gitignore it yourself): only the default /.ladder/ path is
# covered by .gitignore, and rungs write multi-GB snapshots + logs.
# ONE TPU process at a time (axon); run this script alone.
#
# Each rung retries up to MMUMAP_LADDER_TRIES times (default 3): the
# run's graph_cache_path + progress_path make retries cheap -- a tunnel
# death mid-layout resumes from the last epoch chunk instead of
# restarting, so a flaky link can only delay a rung, not kill it.
# A rung that prints END-TO-END on an earlier try is not re-run.
#
# Usage: bash tools/run_scale_ladder.sh [start_rung]
set -u
cd "$(dirname "$0")/.."
LADDER_DIR="${MMUMAP_LADDER_DIR:-$PWD/.ladder}"
mkdir -p "$LADDER_DIR"
START="${1:-31744}"
TRIES="${MMUMAP_LADDER_TRIES:-3}"

run() {
  local n="$1" dtype="$2" timeout_s="$3"
  for try in $(seq 1 "$TRIES"); do
    local log="$LADDER_DIR/e2e_${n}_try${try}.log"
    echo "=== N=$n dtype=$dtype try=$try $(date +%H:%M:%S) -> $log"
    timeout -k 30 "$timeout_s" python -u tools/run_flickr_scale_e2e.py \
      "$n" 1024 "$dtype" "$LADDER_DIR/resume_${n}" 2>&1 | tee "$log"
    local rc=${PIPESTATUS[0]}
    echo "=== N=$n try=$try exit=$rc $(date +%H:%M:%S)"
    # Tunnel sessions need a beat to reap before the next process.
    sleep 180
    grep -q "END-TO-END" "$log" && return 0
  done
  echo "=== N=$n FAILED after $TRIES tries"
  return 0
}

case "$START" in
  31744)   run 31744   float32  1800 ;&
  524288)  run 524288  bfloat16 3600 ;&
  1048576) run 1048576 bfloat16 7200 ;;
  *) echo "unknown rung $START"; exit 1 ;;
esac
