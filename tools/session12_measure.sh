#!/bin/bash
# Round-4 session-12 sweep: decide the production mode first (p3gpack
# vs p3pack same-window A/B — the gathered-interp Mosaic fix 368afef
# landed AFTER p3gpack's last compile failure), then the persistent
# phase budget that directs the round's optimization work, then the
# standalone kernel A/Bs.
#
# ADVICE r3 fixes baked in:
#  * KID_BENCH_COMPILE_TIMEOUT (bench.py-internal per-mode leash) is
#    exported BELOW the watchdog stall limit so the in-process fallback
#    chain advances before the outer kill+retry restarts the compile;
#  * the stall signature sums CPU across the whole process GROUP
#    (setsid makes each stage its own pgid), not one child;
#  * each attempt's exit status is logged, and a fast nonzero exit
#    consumes an attempt instead of silently returning.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export KID_BENCH_COMPILE_TIMEOUT=2100
LOG=${1:-/tmp/session12_measure.log}
echo "=== $(date -u +%FT%TZ) session12 sweep ===" >> "$LOG"

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
      # CPU summed over the whole stage process group (grandchildren
      # included) — a forking benchmark no longer reads as wedged
      local cpu=$(ps -o time= -g "$tpid" 2>/dev/null | tr -d ' \n')
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
    local rc=$?
    echo "[exit] $name attempt $attempt rc=$rc wedged=$wedged" >> "$LOG"
    [ "$wedged" = 0 ] && [ "$rc" = 0 ] && return
  done
}

run p3gpack 2400 2 7200 python tools/bench_persistent.py p3gpack
run p3pack  2400 1 7200 python tools/bench_persistent.py p3pack
run persistent_phases 2400 2 9000 python tools/profile_persistent.py
run kernel_probe 2400 1 9000 python tools/probe_kernel.py \
    spreadg_x21 spread_x21 interp_gathered interp_kernel interp_xla
echo "=== sweep12 complete $(date -u +%T) ===" >> "$LOG"
