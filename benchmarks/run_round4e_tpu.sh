#!/bin/bash
# Round-4 phase E: re-measure everything the hybrid chunk-residual change
# (commit 9f66bfa) affects, after the phase-D battery drains.  The driver
# also runs bench.py at round end, but the suite CSVs must match the
# shipped code.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_runner4e.log
echo "=== run_round4e $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

run() {  # run <timeout_s> <label> <cmd...>
  local t="$1" lbl="$2"; shift 2
  echo "--- $lbl ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- $lbl rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOG"
}

# driver-entry sanity on the real chip (verify step 1b)
run 600 entry python -c "
import jax, __graft_entry__ as g
fn, args = g.entry(); out = jax.jit(fn)(*args)
jax.block_until_ready(out); print('ENTRY OK')"

# flagship with the fused-chunk hybrid residual
run 3000 bench.py python bench.py
grep '\"metric\"' "$LOG" | tail -1 > /tmp/tpu_bench.json 2>/dev/null || true

# hybrid suite rows, merged into the existing CSV (cfd2 scale first)
run 3600 mm_hybrid python -m benchmarks.sparse_mm_suite --no-big \
  --only=hybrid70,hybrid85,hybrid95
run 3600 mm_hybrid_big python -m benchmarks.sparse_mm_suite \
  --only=hybrid70,hybrid85,hybrid95

echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
