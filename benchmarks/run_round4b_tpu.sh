#!/bin/bash
# Round-4 phase B: post-fix re-measurement + tuning sweeps.  Runs AFTER
# run_tpu_battery.sh drains (one bounded process per step; the tunnelled
# chip wedges multi-hour processes).  Ordered by judged value:
#   1. sparse_mm_suite full re-run (pre-fix run died on the 2 GiB
#      executable limit at hybrid-cfd2 scale)
#   2. bench.py (fixed traced-operand threading; flagship metric)
#   3. probes that failed/timed out in phase A (fill: transient backend
#      error; sddmm_core_bf16: fixed Mosaic bf16 widening;
#      chunk_kernel_pg: compile > 1200 s)
#   4. TSGU_MXU_PREC=fast sweep on the DIA MXU cores (VERDICT #2)
#   5. tri-solve decomposition probes + TSGU_WAVE_KPCT sweep (VERDICT #3)
#   6. TSGU_CHUNK_C/SB geometry sweep on the random-pattern SpMM
#      (VERDICT #5)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner4b.log
PROBES=/tmp/tpu_probes4b.jsonl
echo "=== run_round4b $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

run() {  # run <timeout_s> <label> <cmd...>
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "--- $lbl rc=$rc" | tee -a "$LOG"
}

probe() {  # probe <timeout_s> <label> <cmd...>  (stdout -> jsonl)
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout "$t" "$@" >>"$PROBES" 2>>"$LOG"
  echo "--- $lbl rc=$?" | tee -a "$LOG"
}

: > "$PROBES"

run 3600 sparse_mm_suite python -m benchmarks.sparse_mm_suite
run 3000 bench.py python bench.py
grep '"metric"' "$LOG" | tail -1 > /tmp/tpu_bench.json 2>/dev/null || true

probe 1800 probe_fill        python -m benchmarks.probe_dia --only fill
probe 1800 probe_sddmm_bf16  python -m benchmarks.probe_dia --only sddmm_core_bf16
probe 1800 probe_chunk_pg    python -m benchmarks.probe_random_gather --only chunk_kernel_pg

for p in spmm_core sddmm_core spmm_t_core step_full; do
  probe 1800 "prec_fast_$p" env TSGU_MXU_PREC=fast \
    python -m benchmarks.probe_dia --only "$p"
done

for p in fwd_block128 fwd_block512 fwd_block1024 fwd_wave tsolve_block \
         tsolve_wave sddmm_p2 step_block step_wave; do
  probe 1800 "tri_$p" python -m benchmarks.probe_tri --only "$p"
done
for kp in 90 75 50; do
  probe 1800 "tri_wave_kpct$kp" env TSGU_WAVE_KPCT="$kp" \
    python -m benchmarks.probe_tri --only fwd_wave
done

for c in 1024 512 256; do
  probe 1800 "chunk_C$c" env TSGU_CHUNK_C="$c" \
    python -m benchmarks.probe_random_gather --only spmm_auto
done
for sb in 16 4; do
  probe 1800 "chunk_SB$sb" env TSGU_CHUNK_SB="$sb" \
    python -m benchmarks.probe_random_gather --only spmm_auto
done

echo "--- probe summary" | tee -a "$LOG"
cat "$PROBES" | tee -a "$LOG"
echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
