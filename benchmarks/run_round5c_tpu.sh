#!/bin/bash
# Round-5 phase C: full suite re-measures with the round-5 engines
# (Beneš permutation network, composed transpose tri plans, fused bidir
# LSE, MXU body / spmm-backward modes chosen from the phase-B probes).
# The committed CSVs still carry round-4 rows measured BEFORE the
# re-exec 413 fix (git: f41efab) — every suite entry point now re-execs
# with JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS=1, so the nnz1e7 fwd_bwd rows
# get real numbers.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner5c.log
echo "=== run_round5c $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

run() {
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

run 4200 mm_suite     python -m benchmarks.sparse_mm_suite
run 3000 tri_suite    python -m benchmarks.sparse_triangular_solve_suite
run 600  summary      python -m benchmarks.visualize_results
run 1800 lse_ss       python -m benchmarks.sparse_logsumexp_suitesparse
run 1800 lse_rand     python -m benchmarks.sparse_logsumexp_rand
run 1800 batched      python -m benchmarks.batched_sparse_mm_rand
run 600  summary2     python -m benchmarks.visualize_results
run 2400 mm_rand      python -m benchmarks.sparse_mm_rand
run 1500 solve_suite  python -m benchmarks.sparse_solve_suite
run 600  summary3     python -m benchmarks.visualize_results

echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
