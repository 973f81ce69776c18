#!/bin/bash
# Session-8 follow-up: persistent-step phase budget + bn64 probes +
# gathered persistent mode (fires after session8_measure completes).
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session8b_measure.log}
echo "=== $(date -u +%FT%TZ) session8b sweep ===" >> "$LOG"
run() {
  local name=$1 t=$2; shift 2
  echo "--- $name $(date -u +%T)" >> "$LOG"
  timeout "$t" stdbuf -oL "$@" 2>&1 | grep --line-buffered -v WARNING >> "$LOG"
}
run persistent_phases 7200 python tools/profile_persistent.py
run kernel_probe2 7200 python tools/probe_kernel.py \
    ex_bn64_w160 exg_bn64_w160 exg_bn128_w288 \
    spread_x21 spreadg_x21 interp_xla interp_kernel interp_gathered
run persistent3g 7200 python tools/bench_persistent.py persistent3g
echo "=== sweep complete $(date -u +%T) ===" >> "$LOG"
