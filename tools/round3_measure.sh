#!/bin/bash
# Round-3 honest measurement sweep (run when the axon tunnel is alive).
# Each probe runs in its own process; results append to the log.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/round3_measure.log}
echo "=== $(date -u +%FT%TZ) round3 sweep ===" >> "$LOG"
for p in \
    step_fused step_fused3 \
    evolve_with_fused_ia evolve_with_ia3 evolve_with_ia3_sortpay \
    ia_fused_full_2evals ia3_full_2evals \
    ia3_kernel_only ia3_invmap ia3_pd \
    evolve_ia3_bn128_w160 evolve_ia3_bn128_w288 evolve_ia3_bn256_w512 \
    lexsort interp index_walk index_walk_dense thermo_reprod \
    spread_reprod spread_gather spread_scatter_t \
    evolve_noia; do
  case "$p" in
    step_*|evolve_with_*) T=1800 ;;   # cold tunneled compiles take minutes
    *) T=900 ;;
  esac
  timeout $T python tools/profile_phases.py "$p" 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"
  echo "--- $p done $(date -u +%T)" >> /tmp/round3_progress.log
done
echo "--- bench.py $(date -u +%T)" >> /tmp/round3_progress.log
timeout 3500 python bench.py >> "$LOG" 2>>"$LOG.err"
echo "=== sweep complete ===" >> "$LOG"
