"""sparse_mm benchmark at SuiteSparse cfd2 scale (reference
benchmarks/sparse_mm_suite.py): N=123,440, nnz≈3,087,898, M=128.

Two patterns (see bench.py for the rationale): a cfd2-faithful
25-diagonal stencil (DIA execution path) and a uniform-random pattern
(gather-bound worst case), across this library's backends.  Timing is
chained-dependent steps (``measure_chained``).

Run: ``python -m benchmarks.sparse_mm_suite [--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import dia_coverage, sparse_mm
from torchsparsegradutils_tpu.utils import rand_sparse
from torchsparsegradutils_tpu.utils.random_sparse import (hybrid_sparse,
                                                          stencil_sparse)

from .benchmark_utils import measure_chained, write_csv

N, NNZ, M = 123_440, 3_087_898, 128
# BASELINE.md north-star scale: nnz >= 1e7 rows for the roofline claim
N_BIG, NNZ_BIG = 400_000, 10_400_000
STENCIL_OFFSETS = sorted({0, 1, -1, 2, -2, 3, -3, 49, -49, 50, -50, 51,
                          -51, 2401, -2401, 2449, -2449, 2450, -2450,
                          2451, -2451, 2499, -2499, 2500, -2500})


def _run_patterns(rows, n, nnz, m, offs, key, scale_label, only=None):
    kA, kB, kG = jax.random.split(key, 3)
    B = jax.random.normal(kB, (n, m), jnp.float32)
    G = jax.random.normal(kG, (n, m), jnp.float32)
    eps = jnp.float32(1e-12)
    # bytes-moved model (minimum traffic): fwd reads vals + B, writes out;
    # the step additionally reads G and writes (d_vals, d_B)
    fwd_bytes = 4 * (nnz + 2 * n * m)
    step_bytes = 4 * (2 * nnz + 5 * n * m)

    def run(A, pattern, layout, backends, dtype=jnp.float32):
        if only is not None and pattern not in only:
            return
        cov = round(dia_coverage(A)["coverage"], 4)
        # bf16 rows: the documented storage fast path — half the gather /
        # stream bytes, f32 accumulation in every kernel
        A = A.with_data(A.data.astype(dtype))
        Bd, Gd, epsd = B.astype(dtype), G.astype(dtype), eps.astype(dtype)
        isz = jnp.dtype(dtype).itemsize
        fwd_b = isz * (nnz + 2 * n * m)
        step_b = isz * (2 * nnz + 5 * n * m)
        for backend in backends:
            if backend == "pallas" and jax.default_backend() not in (
                    "tpu", "axon"):
                continue

            # values enter as a traced argument (prepare), NOT a closure
            # constant: XLA folding of plan-derived tensors from a
            # concrete operator exceeds the 2 GiB TPU executable limit
            # at hybrid-cfd2 scale
            def make_fwd(d):
                Ad = A.with_data(d)
                return lambda b: b + epsd * sparse_mm(Ad, b,
                                                      backend=backend)

            def fwd_mem(db):
                return make_fwd(db[0])(db[1])

            r = measure_chained(None, Bd, rep=6, n_meas=4,
                                mem_fn=fwd_mem, mem_args=((A.data, Bd),),
                                roofline_bytes=fwd_b,
                                prepare=make_fwd, prep_args=(A.data,))
            rows.append(dict(op="sparse_mm_fwd", pattern=pattern,
                             scale=scale_label, layout=layout,
                             backend=backend, n=n, nnz=A.nnz,
                             rhs=m, dia_coverage=cov, **r))
            grad = jax.grad(
                lambda d, b: (sparse_mm(A.with_data(d), b,
                                        backend=backend) * Gd
                              ).astype(jnp.float32).sum(),
                argnums=(0, 1))

            def step(db):
                d, b = db
                gd, gb = grad(d, b)
                return (d + epsd * gd, b + epsd * gb)

            r = measure_chained(step, (A.data, Bd), rep=6, n_meas=4,
                                mem_fn=step, mem_args=((A.data, Bd),),
                                roofline_bytes=step_b)
            rows.append(dict(op="sparse_mm_fwd_bwd", pattern=pattern,
                             scale=scale_label, layout=layout,
                             backend=backend, n=n, nnz=A.nnz,
                             rhs=m, dia_coverage=cov, **r))
            print(rows[-2], rows[-1], sep="\n", flush=True)
            # incremental write: a timeout/crash mid-suite keeps the
            # rows measured so far (the runner caps each suite process);
            # selective runs merge into the existing CSV
            write_csv("sparse_mm_suite_results.csv", rows,
                      merge=only is not None)

    A_st = stencil_sparse(kA, (n, n), offs, layout="csr")
    run(A_st, "stencil", "csr", ("dia", "xla"))
    # bf16 storage fast path: single MXU pass on the DIA core (vs 6 for
    # exact f32), half the HBM bytes everywhere; f32 accumulation
    run(A_st, "stencil_bf16", "csr", ("dia",), dtype=jnp.bfloat16)
    # realistic FEM regime: mostly-diagonal pattern with an unstructured
    # residual — exercises the hybrid DIA+COO plan (kernels/dia.py) that
    # real matrices (cfd2 included) actually hit
    for cov in (0.70, 0.85, 0.95):
        A_h = hybrid_sparse(kA, (n, n), offs, nnz, dia_coverage=cov,
                            layout="csr")
        run(A_h, f"hybrid{int(cov * 100)}", "csr", ("auto",))
    import os
    ell = () if os.environ.get("TSGU_SUITE_SKIP_ELL") else ("ell",)
    for layout in ("csr", "coo"):
        A = rand_sparse(kA, (n, n), nnz, layout=layout)
        run(A, "random", layout, ("pallas", "xla") + ell)
    # gather-bound worst case at half the row bytes (probe gather_bf16
    # measured the gather floor 2.4x lower at bf16)
    A = rand_sparse(kA, (n, n), nnz, layout="csr")
    run(A, "random_bf16", "csr", ("pallas",), dtype=jnp.bfloat16)


def main(small: bool = False, big: bool = True, only=None,
         scale: str = "both"):
    key = jax.random.PRNGKey(0)
    rows = []
    if small:
        _run_patterns(rows, 8192, 120_000, 128,
                      [0, 1, -1, 9, -9, 64, -64], key, "small", only=only)
    else:
        if scale in ("both", "cfd2"):
            _run_patterns(rows, N, NNZ, M, STENCIL_OFFSETS, key, "cfd2",
                          only=only)
        if big and scale in ("both", "nnz1e7"):
            # nnz >= 1e7 roofline rows (stencil DIA path + random):
            # 26 diagonals at N=400k -> nnz ~ 1.04e7
            offs_big = sorted(set(STENCIL_OFFSETS) | {4})
            _run_patterns(rows, N_BIG, NNZ_BIG, M, offs_big,
                          jax.random.fold_in(key, 7), "nnz1e7", only=only)
    write_csv("sparse_mm_suite_results.csv", rows,
              merge=only is not None or scale != "both")


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    _only = None
    _scale = "both"
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            _only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--scale="):
            _scale = a.split("=", 1)[1]
    main(small="--small" in sys.argv, big="--no-big" not in sys.argv,
         only=_only, scale=_scale)
