#!/bin/bash
# Session-9 follow-up (fires after the session-8 sweep completes):
#   1. one honest persistent3 attempt: NO stall watchdog, 100-min cap
#      (the per-stage 40-min stall kill cannot distinguish a long
#      remote compile from a wedged axon client; give the compile one
#      uninterrupted window);
#   2. exg window-geometry U-curve (bn384..bn1024) + same-window anchor;
#   3. a full bench.py run to warm .jax_cache for the driver.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session9_measure.log}
echo "=== $(date -u +%FT%TZ) session9 sweep ===" >> "$LOG"
run() {
  local name=$1 t=$2; shift 2
  echo "--- $name $(date -u +%T)" >> "$LOG"
  timeout "$t" stdbuf -oL "$@" 2>&1 | grep --line-buffered -v WARNING >> "$LOG"
}
run exg_geometry 7200 python tools/probe_kernel.py \
    exg_bn512_w672 exg_bn384_w544 exg_bn768_w928 exg_bn1024_w1184
run persistent3pack 6000 python tools/bench_persistent.py p3pack
run persistent3_long 6000 python tools/bench_persistent.py persistent3
run bench 10800 python bench.py
echo "=== sweep complete $(date -u +%T) ===" >> "$LOG"
