#!/bin/bash
# Session-6 measurement queue (fires when the axon tunnel recovers):
# 1. persistent3 vs fused3p A/B (the headline question)
# 2. pipelined-kernel A/Bs (extraction + spread + interp)
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/session6_measure.log}
echo "=== $(date -u +%FT%TZ) session6 sweep ===" >> "$LOG"

run() {  # name, timeout, cmd...
  local name=$1 t=$2; shift 2
  echo "--- $name $(date -u +%T)" >> "$LOG"
  timeout "$t" "$@" 2>&1 | grep -v WARNING | tail -4 >> "$LOG"
}

run kernel_probe 3000 python tools/probe_kernel.py
run persistent3k 5400 python tools/bench_persistent.py persistent3k
run persistent3 5400 python tools/bench_persistent.py persistent3
echo "=== sweep complete $(date -u +%T) ===" >> "$LOG"
