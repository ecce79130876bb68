#!/bin/bash
# Round-5 phase A: decision probes on the real TPU.
#   1. benes / benes_bwd — does the exchange network beat the 20.7 ms
#      flat-gather floor at 3M values?  Decides the tri-backward and
#      lse_dim0/bidir strategies (VERDICT r4 items 3/5).
#   2. MXU perf variants (nogather / nodot) — decompose the f32 spmm
#      core's 1.95 ms over its 0.74 ms 6-pass floor (VERDICT item 1).
#   3. hybrid70 step breakdown — fwd/bwd/resid/dia parts vs the 50 ms
#      whole (VERDICT item 8).
# One probe per process (compile caches per-process; chained timing).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner5a.log
PROBES=/tmp/tpu_probes5a.jsonl
echo "=== run_round5a $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

probe() {  # probe <timeout_s> <label> <cmd...>
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  echo "{\"label\": \"$lbl\"}" >> "$PROBES"
  timeout "$t" "$@" >>"$PROBES" 2>>"$LOG"
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

: > "$PROBES"

probe 1200 benes      python -m benchmarks.probe_r5 --only benes
probe 1200 benes_bwd  python -m benchmarks.probe_r5 --only benes_bwd
probe 1200 reorder_take python -m benchmarks.probe_r5 --only reorder_take
probe 1500 mxu_nogather env TSGU_MXU_PERF_VARIANT=nogather \
  python -m benchmarks.probe_r5 --only spmm_core_arg
probe 1500 mxu_nodot env TSGU_MXU_PERF_VARIANT=nodot \
  python -m benchmarks.probe_r5 --only spmm_core_arg
probe 1500 hybrid_fwd       python -m benchmarks.probe_r5 --only hybrid_fwd
probe 1800 hybrid_bwd       python -m benchmarks.probe_r5 --only hybrid_bwd
probe 1800 hybrid_resid_bwd python -m benchmarks.probe_r5 --only hybrid_resid_bwd
probe 1500 hybrid_dia_bwd   python -m benchmarks.probe_r5 --only hybrid_dia_bwd

echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
