#!/bin/bash
# Round-5 phase C2: priority-ordered suite re-measures (C was killed:
# the mm suite's internal order would have burned its timeout on cfd2
# ell/coo rows before ever reaching the nnz1e7 rows).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner5c2.log
echo "=== run_round5c2 $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
run() {
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

# 1. the six stale-413 rows + roofline rows at nnz>=1e7 (ell skipped:
#    strictly dominated backend, unchanged this round)
run 3600 mm_nnz1e7 env TSGU_SUITE_SKIP_ELL=1 \
  python -m benchmarks.sparse_mm_suite --scale=nnz1e7
# 2. cfd2 hybrid rows with the split backward + lowered Benes gates
run 1800 mm_hybrid python -m benchmarks.sparse_mm_suite --scale=cfd2 \
  --only=hybrid70,hybrid85,hybrid95
# 3. triangular solve: composed transpose plans + Benes table fills
run 2400 tri_suite python -m benchmarks.sparse_triangular_solve_suite
run 600  summary1  python -m benchmarks.visualize_results
# 4. logsumexp: Benes dim0 + fused bidir
run 1500 lse_ss    python -m benchmarks.sparse_logsumexp_suitesparse
run 1500 lse_rand  python -m benchmarks.sparse_logsumexp_rand
# 5. cfd2 random rows with the split backward
run 1800 mm_random env TSGU_SUITE_SKIP_ELL=1 \
  python -m benchmarks.sparse_mm_suite --scale=cfd2 --only=random,random_bf16
# 6. batched {4,128} x size sweep
run 1500 batched   python -m benchmarks.batched_sparse_mm_rand
run 600  summary2  python -m benchmarks.visualize_results
# 7. small-size rand sweep + solve suite (time permitting)
run 1800 mm_rand   python -m benchmarks.sparse_mm_rand
run 1200 solve     python -m benchmarks.sparse_solve_suite
run 600  summary3  python -m benchmarks.visualize_results
echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
