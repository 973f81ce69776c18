#!/bin/bash
# Round-4 session-13: leave-one-out phase budget of the p3pack step.
# tools/profile_persistent.py wedged the remote compiler twice in
# session-12; whole-step programs compile reliably (100-280 s), so each
# phase cost = p3pack(full) - p3pack_no<phase>, same window, plus a
# standalone scanned re-sort probe.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session13_measure.log}
echo "=== $(date -u +%FT%TZ) session13 sweep ===" >> "$LOG"

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

run p3pack_full  2400 1 7200 python tools/bench_persistent.py p3pack
run noia         2400 1 7200 python tools/bench_persistent.py p3pack_noia
run sortprobe    2400 1 7200 python tools/bench_persistent.py sortprobe
run nospread     2400 1 7200 python tools/bench_persistent.py p3pack_nospread
run nothermo     2400 1 7200 python tools/bench_persistent.py p3pack_nothermo
run nointerp     2400 1 7200 python tools/bench_persistent.py p3pack_nointerp
run interp_kernel 2400 1 7200 python tools/bench_persistent.py p3pack_ik
echo "=== sweep13 complete $(date -u +%T) ===" >> "$LOG"
