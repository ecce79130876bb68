#!/bin/bash
# Round-5 phase B2: decision probes only, deciders first (the tunnel's
# ~10-min compiles made the full 5b queue too slow).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner5b2.log
PROBES=/tmp/tpu_probes5b2.jsonl
echo "=== run_round5b2 $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
probe() {
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  echo "{\"label\": \"$lbl\"}" >> "$PROBES"
  timeout "$t" "$@" >>"$PROBES" 2>>"$LOG"
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}
: > "$PROBES"
probe 300 parity python /tmp/t_tpu_parity.py
probe 1500 f32dot_fresh env TSGU_MXU_BODY=f32dot \
  python -m benchmarks.probe_r5 --only spmm_core_arg
probe 1500 f32dot_sddmm_fresh env TSGU_MXU_BODY=f32dot \
  python -m benchmarks.probe_r5 --only sddmm_core_arg
probe 1800 random_bwd_split env TSGU_SPMM_BWD=split \
  python -m benchmarks.probe_r5 --only random_bwd
probe 1800 random_bwd_fused python -m benchmarks.probe_r5 --only random_bwd
probe 1800 hybrid_resid_bwd_split env TSGU_SPMM_BWD=split \
  python -m benchmarks.probe_r5 --only hybrid_resid_bwd
probe 1500 bf16_core python -m benchmarks.probe_r5 --only spmm_core_arg_bf16
probe 1800 hybrid_bwd_split env TSGU_SPMM_BWD=split TSGU_MXU_BODY=f32dot \
  python -m benchmarks.probe_r5 --only hybrid_bwd
echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
