#!/bin/bash
# Session-7 follow-up sweep: same-window baselines the session-6 queue
# lacked.  Fires after session6_measure.sh finishes (the tunnel drifts
# ~1.7x between sessions, so persistent3k needs a SAME-WINDOW fused3p
# number, and the probe's ex_* lines were lost to a tail-4 truncation).
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session7_measure.log}
echo "=== $(date -u +%FT%TZ) session7 sweep ===" >> "$LOG"

run() {  # name, timeout, cmd...
  local name=$1 t=$2; shift 2
  echo "--- $name $(date -u +%T)" >> "$LOG"
  timeout "$t" stdbuf -oL "$@" 2>&1 | grep --line-buffered -v WARNING >> "$LOG"
}

run fused3p 5400 python tools/bench_persistent.py fused3p
run kernel_probe 4800 python tools/probe_kernel.py \
    ex_bn128_w288 exp_bn128_w288 exg_bn128_w288 \
    ex_bn256_w416 exp_bn256_w416 exg_bn256_w416 exg_bn512_w672 \
    spread_x21 spreadp_x21 spreadg_x21 \
    interp_xla interp_kernel interp_gathered
run persistent3g 5400 python tools/bench_persistent.py persistent3g
echo "=== sweep complete $(date -u +%T) ===" >> "$LOG"
