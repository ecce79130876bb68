#!/bin/bash
# Round-4 phase C: reprioritized TPU battery (supersedes run_round4b).
# Remote compiles dominate wall-clock (~2-4 min per program over the
# tunnel), so the order is judged-artifact-first:
#   1. bench.py           — flagship JSON (driver-recorded)
#   2. decision probes    — DIA step split, MXU prec sweep, tri
#                           wave-vs-block, chunk geometry (tuning input)
#   3. suites             — fresh differenced CSVs (incremental writes)
# Every step is one bounded process (the tunnelled chip wedges
# multi-hour processes and every step must be re-runnable in isolation).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner4c.log
PROBES=/tmp/tpu_probes4c.jsonl
echo "=== run_round4c $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

run() {  # run <timeout_s> <label> <cmd...>
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

probe() {  # probe <timeout_s> <label> <cmd...>  (stdout -> jsonl)
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  echo "{\"label\": \"$lbl\"}" >> "$PROBES"
  timeout "$t" "$@" >>"$PROBES" 2>>"$LOG"
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

: > "$PROBES"

# 1. flagship
run 3600 bench.py python bench.py
grep '"metric"' "$LOG" | tail -1 > /tmp/tpu_bench.json 2>/dev/null || true

# 2a. DIA step decomposition + MXU precision + bf16 (VERDICT #2)
for p in spmm_core sddmm_core fill step_full; do
  probe 1200 "dia_$p" python -m benchmarks.probe_dia --only "$p"
done
probe 1200 dia_spmm_bf16 python -m benchmarks.probe_dia --only spmm_core_bf16
for p in spmm_core step_full; do
  probe 1200 "prec_fast_$p" env TSGU_MXU_PREC=fast \
    python -m benchmarks.probe_dia --only "$p"
done

# 2b. tri solve: wave vs block + ELL-width sweep (VERDICT #3)
for p in fwd_block128 fwd_block512 fwd_wave tsolve_wave step_block step_wave; do
  probe 1200 "tri_$p" python -m benchmarks.probe_tri --only "$p"
done
for kp in 90 75; do
  probe 1200 "tri_wave_kpct$kp" env TSGU_WAVE_KPCT="$kp" \
    python -m benchmarks.probe_tri --only fwd_wave
done

# 2c. random-pattern chunk geometry (VERDICT #5)
probe 1200 chunk_base python -m benchmarks.probe_random_gather --only spmm_auto
for c in 1024 512; do
  probe 1200 "chunk_C$c" env TSGU_CHUNK_C="$c" \
    python -m benchmarks.probe_random_gather --only spmm_auto
done
probe 1200 chunk_SB16 env TSGU_CHUNK_SB=16 \
  python -m benchmarks.probe_random_gather --only spmm_auto

# 3. suites (incremental CSV writes keep partial progress on timeout)
run 5400 sparse_mm_suite python -m benchmarks.sparse_mm_suite
run 3600 tri_suite       python -m benchmarks.sparse_triangular_solve_suite
run 3600 logsumexp_ss    python -m benchmarks.sparse_logsumexp_suitesparse
run 3600 solve_suite     python -m benchmarks.sparse_solve_suite

echo "--- probe summary" | tee -a "$LOG"
cat "$PROBES" | tee -a "$LOG"
echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
