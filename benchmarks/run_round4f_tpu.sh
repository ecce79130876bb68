#!/bin/bash
# Round-4 phase F: final-priority battery for the remaining wall-clock.
# Replaces the tail of run_round4d once the tri decision probes land:
#   1-3. tri / lse / solve suites — fresh differenced CSVs (the committed
#        rows are round-2-era trap-inflated numbers)
#   4. mm suite hybrid re-measure — fused chunk-residual backward
#      (9f66bfa) + the as_device_array HLO-literal fix for the HTTP 413
#      rows at nnz1e7
#   5. summary/plots
#   6. decomposition probes with whatever time remains
# bench.py is NOT here: the driver runs it at round end on final code.
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
run 1800 logsumexp_ss python -m benchmarks.sparse_logsumexp_suitesparse
run 1500 solve_suite  python -m benchmarks.sparse_solve_suite
# JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS hoists captured index arrays as
# runtime args instead of HLO literals — at nnz~1e7 the literals are
# 40-80 MB each and the tunnelled remote compiler rejects the upload
# (HTTP 413).  Must be set before the interpreter starts (the mlir
# lowering default is frozen at import).
run 2400 mm_hybrid env JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS=1 \
  python -m benchmarks.sparse_mm_suite --only=hybrid70,hybrid85,hybrid95
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
