#!/bin/bash
# Session-8 sweep: persistent3 headline + gathered-kernel A/Bs +
# persistent phase budget.  Each stage runs under a stall watchdog:
# the tunneled axon client has NO RPC timeout, so a tunnel blip wedges
# the process forever at 0 CPU — kill and retry once if neither the
# log nor the python's CPU time advances for 40 min (legitimate remote
# compiles show either local lowering CPU or finish within ~15 min).
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session8_measure.log}
echo "=== $(date -u +%FT%TZ) session8 sweep (watchdog) ===" >> "$LOG"

run() {  # name, timeout, cmd...
  local name=$1 t=$2; shift 2
  local attempt
  for attempt in 1 2; do
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
      if [ "$stall" -ge 2400 ]; then
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

run persistent3 10800 python tools/bench_persistent.py persistent3
run kernel_probe 7200 python tools/probe_kernel.py \
    ex_bn128_w288 exg_bn128_w288 ex_bn64_w160 exg_bn64_w160 \
    spread_x21 spreadg_x21 interp_xla interp_kernel interp_gathered
run persistent_phases 7200 python tools/profile_persistent.py
run persistent3g 7200 python tools/bench_persistent.py persistent3g
echo "=== sweep complete $(date -u +%T) ===" >> "$LOG"
