"""Micro-probes: triangular-solve step breakdown at cfd2-factor scale.

The round-4 tri suite measured (random lower factor, n=123440,
nnz~1.54M, M=2): block@128 fwd 24.3 ms / step 149 ms, wave fwd 26.1 ms
/ step 174.6 ms — the wave's 7.4x step-count reduction (965 -> ~130)
did NOT show up in wall clock, and the backward is ~5x the forward
where the IFT decomposition (transpose solve + p=2 sddmm) predicts
~2.5x.  These probes separate the suspects:

  fwd_block128/512/1024  blocked scan at three block sizes (the suite
                         pinned 128; fewer+bigger steps amortise the
                         ~25 us/step sequential latency)
  fwd_wave               level-scheduled wave (TSGU_WAVE_KPCT applies:
                         the base-ELL width is the padded-gather
                         amplification knob)
  tsolve_block/wave      the backward's transpose solve alone
  sddmm_p2               the backward's gradA sddmm alone (p=2 row
                         gathers: per-transaction-bound)
  cotangent              sparse_cotangent assembly alone
  step_block/step_wave   one fwd+bwd chained grad step (suite config)

One probe per process: ``python -m benchmarks.probe_tri --only NAME``.
"""

import argparse
import json
import os
import sys

ALL = ["fwd_block128", "fwd_block512", "fwd_block1024", "fwd_wave",
       "tsolve_block", "tsolve_wave", "sddmm_p2", "cotangent",
       "step_block", "step_wave", "val_gather128", "val_gather512"]

N_ROWS = 123_440
NNZ = 3_087_898 // 2
M_RHS = 2


def chain(step, x0, rep=8, n_meas=4):
    from .benchmark_utils import chain_diff
    return chain_diff(step, x0, rep=rep, n_meas=n_meas)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--only", default=None, choices=ALL)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    n = 8192 if args.small else N_ROWS
    nnz = 60_000 if args.small else NNZ
    sel = [args.only] if args.only else ALL
    print(f"backend={jax.default_backend()} n={n} nnz={nnz} "
          f"kpct={os.environ.get('TSGU_WAVE_KPCT', '99.0')} probes={sel}",
          file=sys.stderr)

    from torchsparsegradutils_tpu import sparse_triangular_solve
    from torchsparsegradutils_tpu.ops.spmm import sddmm
    from torchsparsegradutils_tpu.ops.common import sparse_cotangent
    from torchsparsegradutils_tpu.utils import rand_sparse_tri

    key = jax.random.PRNGKey(0)
    A = rand_sparse_tri(key, (n, n), nnz, upper=False, layout="csr")
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, M_RHS),
                          jnp.float32)
    X = jax.random.normal(jax.random.fold_in(key, 2), (n, M_RHS),
                          jnp.float32)
    eps = jnp.float32(1e-12)

    def solve_step(algorithm, transpose=False, block_size=None):
        def stepf(b):
            return b + eps * sparse_triangular_solve(
                A, b, upper=False, transpose=transpose,
                algorithm=algorithm, block_size=block_size)
        return stepf

    def grad_step(algorithm, block_size=None):
        grad = jax.grad(lambda d, b: (sparse_triangular_solve(
            A.with_data(d), b, upper=False, algorithm=algorithm,
            block_size=block_size) ** 2).sum())

        def stepf(d):
            return d + eps * grad(d, B)
        return stepf

    def rep_probe(name):
        if name.startswith("fwd_block"):
            ms, cs = chain(solve_step("block",
                                      block_size=int(name[9:])), B)
        elif name == "fwd_wave":
            ms, cs = chain(solve_step("wave"), B)
        elif name == "tsolve_block":
            ms, cs = chain(solve_step("block", transpose=True,
                                      block_size=128), B)
        elif name == "tsolve_wave":
            ms, cs = chain(solve_step("wave", transpose=True), B)
        elif name == "sddmm_p2":
            ms, cs = chain(lambda g: g + eps * sddmm(A, g, X).data.sum(),
                           X)
        elif name == "cotangent":
            ms, cs = chain(
                lambda v: v + eps * sparse_cotangent(A, v).data.sum(),
                A.data)
        elif name == "step_block":
            ms, cs = chain(grad_step("block", block_size=128), A.data)
        elif name == "step_wave":
            ms, cs = chain(grad_step("wave"), A.data)
        elif name.startswith("val_gather"):
            # the blocked plan's ELL value-table fill alone (scalar static
            # gather, nnz -> (nblk, nb, K) with sentinel padding): suspected
            # dominant term of both the forward scan and the transpose solve
            from torchsparsegradutils_tpu.ops.triangular_solve import (
                _build_tri_plan)
            from torchsparsegradutils_tpu.types import StaticArray
            import numpy as np
            nb = int(name[10:])
            rows = StaticArray(np.asarray(A.rows_np()))
            colsa = StaticArray(np.asarray(A.cols_np()))
            plan = _build_tri_plan(rows, colsa, n, nb, True)
            tbl = plan.ell_sel.size
            eps32 = jnp.float32(1e-30)
            ms, cs = chain(lambda d: d + eps32 * plan.val_gather(d).sum(),
                           A.data)
            print(json.dumps({"probe": name, "table_slots": int(tbl),
                              "K": int(plan.ell_sel.shape[-1])}),
                  flush=True)
        print(json.dumps({"probe": name, "ms": round(ms, 3),
                          "kpct": os.environ.get("TSGU_WAVE_KPCT", "99.0"),
                          "note": f"compile {cs:.0f}s"}), flush=True)

    for name in sel:
        rep_probe(name)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main()
