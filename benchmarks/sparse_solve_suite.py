"""sparse_generic_solve benchmark: native Krylov (CG / BiCGSTAB / MINRES)
vs foreign scipy host-callback solvers (reference
benchmarks/sparse_generic_solve_suite.py + the cupy comparison) on SPD
systems.  Reproduces the reference's headline claim #2: in-framework
solvers beat cross-framework wrappers by avoiding per-call conversion.

Two SPD matrices are measured at the reference's cfd2 scale
(N = 123,440, nnz ≈ 3.09M; reference CG fwd 105 ms / bwd 208 ms,
MINRES fwd 99 ms on an RTX 4090 with the real cfd2):

* ``stencil``: a symmetrised 25-diagonal stencil operator — faithful to
  cfd2's structured-CFD origin, runs the DIA matvec path;
* ``random``: make_spd_sparse at a smaller n (the gather-bound
  worst case, kept for continuity with round-1 CSVs).

Run: ``python -m benchmarks.sparse_solve_suite [--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from torchsparsegradutils_tpu import sparse_generic_solve, sparse_mm
from torchsparsegradutils_tpu.solvers import (
    BICGSTABSettings, LinearCGSettings, MINRESSettings,
    bicgstab, linear_cg, minres)
from torchsparsegradutils_tpu.utils import make_spd_sparse
from torchsparsegradutils_tpu.utils.random_sparse import make_spd_stencil

from .benchmark_utils import measure_chained, measure_op, write_csv

CFD2_OFFSETS = [1, 2, 3, 49, 50, 51, 2401, 2449, 2450, 2451, 2499, 2500]


def run_matrix(A, b, label, rows, n, nnz):
    configs = [
        ("cg", linear_cg, dict(settings=LinearCGSettings(
            max_iter=200, rtol=1e-5))),
        ("minres", minres, dict(settings=MINRESSettings(
            max_iter=200, rtol=1e-5))),
        ("bicgstab", bicgstab, dict(settings=BICGSTABSettings(
            max_iter=200, rtol=1e-5))),
    ]
    eps = jnp.float32(1e-9)
    for name, solver, kw in configs:
        fwd = lambda d, bb: sparse_generic_solve(
            A.with_data(d), bb, solve=solver, transpose_solve=solver, **kw)
        fwd_step = lambda bb: bb + eps * fwd(A.data, bb)
        r = measure_chained(fwd_step, b, rep=4, n_meas=4,
                            mem_fn=fwd_step, mem_args=(b,))
        x = jax.jit(fwd)(A.data, b)
        res = float(jnp.linalg.norm(
            sparse_mm(A, x[:, None])[:, 0] - b) / jnp.linalg.norm(b))
        rows.append(dict(op="solve_fwd", algorithm=name, matrix=label,
                         n=n, nnz=nnz, rel_residual=round(res, 6), **r))
        print(rows[-1], flush=True)
        bwd = jax.grad(lambda d, bb: (sparse_generic_solve(
            A.with_data(d), bb, solve=solver, transpose_solve=solver,
            **kw) ** 2).sum())
        bwd_step = lambda d: d + eps * bwd(d, b)
        r = measure_chained(bwd_step, A.data, rep=4, n_meas=4,
                            mem_fn=bwd_step, mem_args=(A.data,))
        rows.append(dict(op="solve_bwd", algorithm=name, matrix=label,
                         n=n, nnz=nnz, rel_residual=None, **r))
        print(rows[-1], flush=True)
        # incremental write: a timeout/crash mid-suite keeps prior rows
        write_csv("sparse_generic_solve_suite_results.csv", rows)


def main(small: bool = False):
    key = jax.random.PRNGKey(0)
    rows = []

    # cfd2-scale stencil SPD (DIA path)
    n = 4096 if small else 123_440
    offs = [1, 3, 9] if small else CFD2_OFFSETS
    A = make_spd_stencil(key, n, offs, layout="csr")
    b = jax.random.normal(jax.random.fold_in(key, 1), (n,))
    print(f"stencil SPD: n={n} nnz={A.nnz}", flush=True)
    run_matrix(A, b, "stencil_cfd2" if not small else "stencil_small",
               rows, n, A.nnz)

    # random SPD (gather-bound generic path)
    n_r = 4096 if small else 65_536
    nnz_r = n_r + 2 * (4 * n_r)
    A_r = make_spd_sparse(key, n_r, nnz_r, layout="csr")
    b_r = jax.random.normal(jax.random.fold_in(key, 2), (n_r,))
    run_matrix(A_r, b_r, "random", rows, n_r, A_r.nnz)

    # foreign host solver comparison (conversion + host transfer overhead)
    try:
        from torchsparsegradutils_tpu.interop import sparse_solve_scipy
        fwd = lambda d, bb: sparse_solve_scipy(A_r.with_data(d), bb,
                                               method="cg")
        r = measure_op(fwd, (A_r.data, b_r), n_runs=4, pipeline=1)
        rows.append(dict(op="solve_fwd", algorithm="scipy_cg_host",
                         matrix="random", n=n_r, nnz=A_r.nnz,
                         rel_residual=None, **r))
        print(rows[-1], flush=True)
    except Exception as e:  # noqa: BLE001
        rows.append(dict(op="solve_fwd", algorithm="scipy_cg_host",
                         matrix="random", n=n_r, nnz=A_r.nnz,
                         rel_residual=None, time_us=float("nan"),
                         time_std_us=float("nan"), mem_MB=None,
                         error=str(e)[:200]))
    write_csv("sparse_generic_solve_suite_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
