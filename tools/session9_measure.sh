#!/bin/bash
# Session-9 follow-up (fires after the session-8 sweep completes).
#
# The tunneled axon client has NO RPC timeout: any tunnel blip wedges
# the in-flight call forever (0 CPU, no output).  Completed compiles
# land in .jax_cache, so KILLING a wedged run and re-running the same
# command resumes at the wedged probe with every earlier compile
# cached.  Probe stages therefore run under a 20-min stall watchdog
# with up to 4 attempts; the two deliberately-long persistent compile
# probes get one uninterrupted 100-min window each (a legit remote
# compile of the big scanned program may exceed any sane stall bound).
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/session9_measure.log}
echo "=== $(date -u +%FT%TZ) session9 sweep ===" >> "$LOG"

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

run exg_geometry 1200 4 7200 python tools/probe_kernel.py \
    exg_bn512_w672 exg_bn384_w544 exg_bn768_w928 exg_bn1024_w1184
run persistent3pack 6600 1 6000 python tools/bench_persistent.py p3pack
run persistent3_long 6600 1 6000 python tools/bench_persistent.py persistent3
run bench 1800 3 10800 python bench.py
echo "=== sweep complete $(date -u +%T) ===" >> "$LOG"
