#!/bin/bash
# Session-10 follow-up: the A/Bs killed with the session-8 wedge —
# spreading/interp kernel variants and the persistent phase budget.
# Runs with the session-9 stall-watchdog pattern (see session9_measure.sh
# for the rationale: the axon client has no RPC timeout; completed
# compiles persist in .jax_cache so kill+retry resumes cheaply).
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session10_measure.log}
echo "=== $(date -u +%FT%TZ) session10 sweep ===" >> "$LOG"

run() {  # name stall_s attempts timeout cmd...
  local name=$1 stall_lim=$2 attempts=$3 t=$4; shift 4
  local attempt
  for attempt in $(seq 1 "$attempts"); do
    echo "--- $name $(date -u +%T) (attempt $attempt)" >> "$LOG"
    setsid timeout "$t" stdbuf -oL "$@" \
      > >(grep --line-buffered -v WARNING >> "$LOG") 2>&1 &
    local tpid=$!
    local last="" stall=0 wedged=0
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 60
      local py=$(pgrep -P "$tpid" | head -1)
      local cpu=$(ps -o time= -p "$py" 2>/dev/null | tr -d ' ')
      local sig="$(stat -c %s "$LOG" 2>/dev/null):$cpu"
      if [ "$sig" = "$last" ]; then stall=$((stall + 60)); else stall=0; fi
      last="$sig"
      if [ "$stall" -ge "$stall_lim" ]; then
        echo "[watchdog] $name wedged ${stall}s, killing" >> "$LOG"
        kill -- -"$tpid" 2>/dev/null; sleep 5
        kill -9 -- -"$tpid" 2>/dev/null
        wedged=1
        break
      fi
    done
    wait "$tpid" 2>/dev/null
    [ "$wedged" = 0 ] && return
  done
}

run p3pack 2400 2 7200 python tools/bench_persistent.py p3pack
run kernel_probe 1200 4 7200 python tools/probe_kernel.py \
    spread_x21 spreadg_x21 interp_xla interp_kernel interp_gathered
run persistent_phases 1200 3 7200 python tools/profile_persistent.py
run bench 1800 2 10800 python bench.py
echo "=== sweep complete $(date -u +%T) ===" >> "$LOG"
