#!/bin/bash
# Round-5 phase B: MXU-core machinery decomposition + f32dot mode A/B.
# The 5a probes showed nogather 1.815 / nodot 1.821 vs full 1.953 ms:
# neither gathers nor dots are the critical path — the halo machinery
# is.  These probes split that, and A/B the new f32dot body (single f32
# halo, Mosaic-internal bf16x6 decomposition).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner5b.log
PROBES=/tmp/tpu_probes5b.jsonl
echo "=== run_round5b $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

probe() {
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  echo "{\"label\": \"$lbl\"}" >> "$PROBES"
  timeout "$t" "$@" >>"$PROBES" 2>>"$LOG"
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

: > "$PROBES"

probe 1500 f32dot env TSGU_MXU_BODY=f32dot \
  python -m benchmarks.probe_r5 --only spmm_core_arg
probe 1500 f32dot_sddmm env TSGU_MXU_BODY=f32dot \
  python -m benchmarks.probe_r5 --only sddmm_core_arg
probe 1500 empty env TSGU_MXU_PERF_VARIANT=empty \
  python -m benchmarks.probe_r5 --only spmm_core_arg
probe 1500 noroll env TSGU_MXU_PERF_VARIANT=noroll \
  python -m benchmarks.probe_r5 --only spmm_core_arg
probe 1500 nowin env TSGU_MXU_PERF_VARIANT=nowin \
  python -m benchmarks.probe_r5 --only spmm_core_arg
probe 1500 bf16_core python -m benchmarks.probe_r5 --only spmm_core_arg_bf16
probe 1500 empty_f32dot env TSGU_MXU_BODY=f32dot TSGU_MXU_PERF_VARIANT=empty \
  python -m benchmarks.probe_r5 --only spmm_core_arg

echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

# ---- appended: split-backward A/B (Beneš-era) --------------------------
probe 1800 hybrid_bwd_split env TSGU_SPMM_BWD=split \
  python -m benchmarks.probe_r5 --only hybrid_bwd
probe 1800 hybrid_resid_bwd_split env TSGU_SPMM_BWD=split \
  python -m benchmarks.probe_r5 --only hybrid_resid_bwd
echo "=== done-b2 $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
probe 1800 random_bwd_fused python -m benchmarks.probe_r5 --only random_bwd
probe 1800 random_bwd_split env TSGU_SPMM_BWD=split \
  python -m benchmarks.probe_r5 --only random_bwd
echo "=== done-b3 $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
probe 1500 f32dot_rt8k env TSGU_MXU_BODY=f32dot \
  python -m benchmarks.probe_r5 --only spmm_core_arg
echo "=== done-b4 $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
probe 1500 f32dot_sddmm_fresh env TSGU_MXU_BODY=f32dot \
  python -m benchmarks.probe_r5 --only sddmm_core_arg
echo "=== done-b5 $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
