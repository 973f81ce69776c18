#!/bin/bash
# Session-8 sweep: gathered-kernel A/Bs (block-major fix) + the
# persistent3 headline number that timed out in sessions 6/7.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session8_measure.log}
echo "=== $(date -u +%FT%TZ) session8 sweep ===" >> "$LOG"

run() {  # name, timeout, cmd...
  local name=$1 t=$2; shift 2
  echo "--- $name $(date -u +%T)" >> "$LOG"
  timeout "$t" stdbuf -oL "$@" 2>&1 | grep --line-buffered -v WARNING >> "$LOG"
}

run persistent3 10800 python tools/bench_persistent.py persistent3
run kernel_probe 7200 python tools/probe_kernel.py \
    ex_bn128_w288 exg_bn128_w288 exg_bn256_w416 exg_bn512_w672 \
    ex_bn64_w160 exg_bn64_w160 \
    spread_x21 spreadg_x21 interp_xla interp_kernel interp_gathered
run persistent_phases 7200 python tools/profile_persistent.py
run persistent3g 7200 python tools/bench_persistent.py persistent3g
echo "=== sweep complete $(date -u +%T) ===" >> "$LOG"
