#!/bin/bash
# Session-11: deliverable-first ordering.  The round-end BENCH_r03 comes
# from bench.py, so it runs FIRST (cold .jax_cache on this machine —
# p3pack compiled in ~100 s cold in session 10; bench's own abandonable
# warmup threads bound any one mode's compile).  Then the A/Bs that
# decide defaults: p3gpack, the persistent phase budget, kernel probes.
# Long stall leashes: this window's remote compiles exceed 20 min and a
# kill+retry restarts the same compile from scratch.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session11_measure.log}
echo "=== $(date -u +%FT%TZ) session11 sweep ===" >> "$LOG"

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

run bench 2400 2 10800 python bench.py
run p3gpack 3600 1 7200 python tools/bench_persistent.py p3gpack
run persistent_phases 3600 2 9000 python tools/profile_persistent.py
run kernel_probe 3600 1 9000 python tools/probe_kernel.py \
    spreadg_x21 spread_x21 interp_gathered interp_kernel interp_xla
echo "=== sweep11 complete $(date -u +%T) ===" >> "$LOG"
