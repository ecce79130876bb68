#!/bin/bash
# Round-4 phase F: final-priority battery for the remaining wall-clock.
# Replaces the tail of run_round4d (which ordered probes before the lse /
# solve suites) once the tri decision probes have landed:
#   1. tri suite     — fresh differenced CSV (stale rows are round-2-era)
#   2. lse suite     — same
#   3. solve suite   — same
#   4. bench.py      — hybrid regimes on the fused chunk-residual backward
#   5. summary/plots — regenerate results/SUMMARY.md + pngs
#   6. leftover probes (DIA step decomposition) if time remains
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner4f.log
PROBES=/tmp/tpu_probes4f.jsonl
echo "=== run_round4f $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

run() {  # run <timeout_s> <label> <cmd...>
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

probe() {
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  echo "{\"label\": \"$lbl\"}" >> "$PROBES"
  timeout "$t" "$@" >>"$PROBES" 2>>"$LOG"
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

: > "$PROBES"

run 3000 tri_suite    python -m benchmarks.sparse_triangular_solve_suite
run 2400 logsumexp_ss python -m benchmarks.sparse_logsumexp_suitesparse
run 2400 solve_suite  python -m benchmarks.sparse_solve_suite
run 3000 bench.py python bench.py
grep '"metric"' "$LOG" | tail -1 > /tmp/tpu_bench.json 2>/dev/null || true
run 600 summary python -m benchmarks.visualize_results

for p in fill step_full; do
  probe 1200 "dia_$p" python -m benchmarks.probe_dia --only "$p"
done
# tri backward decomposition + block-size amortisation
for p in sddmm_p2 tsolve_block fwd_block512; do
  probe 1200 "tri_$p" python -m benchmarks.probe_tri --only "$p"
done
probe 1200 chunk_base python -m benchmarks.probe_random_gather --only spmm_auto
run 600 summary2 python -m benchmarks.visualize_results

echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
