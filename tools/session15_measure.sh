#!/bin/bash
# Round-4 session-15: scatter fold A/B + the p3tab candidate mode.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session15_measure.log}
echo "=== $(date -u +%FT%TZ) session15 sweep ===" >> "$LOG"
run() {
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
      local cpu=$(ps -o time= -g "$tpid" 2>/dev/null | tr -d ' \n')
      local sig="$(stat -c %s "$LOG" 2>/dev/null):$cpu"
      if [ "$sig" = "$last" ]; then stall=$((stall + 60)); else stall=0; fi
      last="$sig"
      if [ "$stall" -ge "$stall_lim" ]; then
        echo "[watchdog] $name wedged ${stall}s, killing" >> "$LOG"
        kill -- -"$tpid" 2>/dev/null; sleep 5
        kill -9 -- -"$tpid" 2>/dev/null
        wedged=1; break
      fi
    done
    wait "$tpid" 2>/dev/null
    local rc=$?
    echo "[exit] $name attempt $attempt rc=$rc wedged=$wedged" >> "$LOG"
    [ "$wedged" = 0 ] && [ "$rc" = 0 ] && return
  done
}
run p3pack_scatterfold 2400 1 7200 python tools/bench_persistent.py p3pack
run p3pack_gfold       2400 1 7200 python tools/bench_persistent.py p3pack_gfold
run p3tab              2400 2 7200 python tools/bench_persistent.py p3tab
echo "=== sweep15 complete $(date -u +%T) ===" >> "$LOG"
