#!/bin/bash
# Full TPU measurement battery (round 4).  One bounded process per step —
# the tunnelled chip wedges multi-hour processes, and every step must be
# re-runnable in isolation.  Results land in benchmarks/results/*.csv
# (suites) and /tmp/tpu_probes.jsonl (probes) + /tmp/tpu_bench.json.
#
# Usage:  bash benchmarks/run_tpu_battery.sh [phase]
#   phase ∈ {probes, suites, bench, all (default)}
set -u
cd "$(dirname "$0")/.."
PH="${1:-all}"
LOG=/tmp/tpu_runner.log
echo "=== run_tpu_battery $(date -u +%H:%M:%S) phase=$PH ===" | tee -a "$LOG"

run() {  # run <timeout_s> <label> <cmd...>
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "--- $lbl rc=$rc" | tee -a "$LOG"
}

if [ "$PH" = probes ] || [ "$PH" = all ]; then
  : > /tmp/tpu_probes.jsonl
  for p in gather_csr gather_sorted gather_bf16 gather_mat stream_read \
           chunk_kernel_pg chunk_combine spmm_auto spmv_p1; do
    echo "--- probe $p ($(date -u +%H:%M:%S))" | tee -a "$LOG"
    timeout 1800 python -m benchmarks.probe_random_gather --only "$p" \
      >>/tmp/tpu_probes.jsonl 2>>"$LOG"
  done
  for p in fill unfill spmm_core sddmm_core spmm_t_core spmm_vpu \
           sddmm_vpu fwd_full spmm_core_bf16 sddmm_core_bf16 \
           step_full; do
    echo "--- dia probe $p ($(date -u +%H:%M:%S))" | tee -a "$LOG"
    timeout 1800 python -m benchmarks.probe_dia --only "$p" \
      >>/tmp/tpu_probes.jsonl 2>>"$LOG" || true
  done
fi

if [ "$PH" = bench ] || [ "$PH" = all ]; then
  run 3000 bench.py python bench.py
  # the JSON record is the last '"metric"' line of the log (NOT tail -1,
  # which grabs the rc line the runner itself appends)
  grep '"metric"' "$LOG" | tail -1 > /tmp/tpu_bench.json 2>/dev/null || true
fi

if [ "$PH" = suites ] || [ "$PH" = all ]; then
  run 3600 sparse_mm_suite      python -m benchmarks.sparse_mm_suite
  run 3600 logsumexp_ss         python -m benchmarks.sparse_logsumexp_suitesparse
  run 3600 tri_suite            python -m benchmarks.sparse_triangular_solve_suite
  run 3600 solve_suite          python -m benchmarks.sparse_solve_suite
  run 3600 generic_solve        python -m benchmarks.sparse_generic_solve_rand
  run 3600 sparse_mm_rand       python -m benchmarks.sparse_mm_rand
  run 3600 batched_mm_rand      python -m benchmarks.batched_sparse_mm_rand
  run 3600 logsumexp_rand       python -m benchmarks.sparse_logsumexp_rand
  run 3600 tri_rand             python -m benchmarks.sparse_triangular_solve_rand
fi
if [ "$PH" = suites ] || [ "$PH" = all ]; then
  run 900 visualize python -m benchmarks.visualize_results
  echo "--- probe summary" | tee -a "$LOG"
  cat /tmp/tpu_probes.jsonl 2>/dev/null | tee -a "$LOG"
  echo "--- bench" | tee -a "$LOG"
  cat /tmp/tpu_bench.json 2>/dev/null | tee -a "$LOG"
fi
echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
