"""sparse_generic_solve benchmark: native Krylov (CG / BiCGSTAB / MINRES)
vs foreign scipy host-callback solvers (reference
benchmarks/sparse_generic_solve_suite.py + the cupy comparison) on an SPD
system.  Reproduces the reference's headline claim #2: in-framework
solvers beat cross-framework wrappers by avoiding per-call conversion.

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

from .benchmark_utils import measure_op, write_csv


def main(small: bool = False):
    n = 4096 if small else 65_536
    nnz = n + 2 * (4 * n)
    key = jax.random.PRNGKey(0)
    A = make_spd_sparse(key, n, nnz, layout="csr")
    b = jax.random.normal(jax.random.fold_in(key, 1), (n,))
    rows = []
    configs = [
        ("cg", linear_cg, dict(settings=LinearCGSettings(
            max_iter=200, rtol=1e-5))),
        ("minres", minres, dict(settings=MINRESSettings(
            max_iter=200, rtol=1e-5))),
        ("bicgstab", bicgstab, dict(settings=BICGSTABSettings(
            max_iter=200, rtol=1e-5))),
    ]
    for name, solver, kw in configs:
        fwd = lambda d, b: sparse_generic_solve(
            A.with_data(d), b, solve=solver, transpose_solve=solver, **kw)
        r = measure_op(fwd, (A.data, b), n_runs=10, pipeline=2,
                       with_memory=False)
        x = jax.jit(fwd)(A.data, b)
        res = float(jnp.linalg.norm(
            sparse_mm(A, x[:, None])[:, 0] - b) / jnp.linalg.norm(b))
        rows.append(dict(op="solve_fwd", algorithm=name, n=n, nnz=nnz,
                         rel_residual=round(res, 6), **r))
        bwd = jax.grad(lambda d, b: (sparse_generic_solve(
            A.with_data(d), b, solve=solver, transpose_solve=solver,
            **kw) ** 2).sum())
        r = measure_op(bwd, (A.data, b), n_runs=10, pipeline=2,
                       with_memory=False)
        rows.append(dict(op="solve_bwd", algorithm=name, n=n, nnz=nnz,
                         rel_residual=None, **r))
        print(rows[-2], rows[-1], sep="\n", flush=True)
    # foreign host solver comparison (conversion + host transfer overhead)
    try:
        from torchsparsegradutils_tpu.interop import sparse_solve_scipy
        fwd = lambda d, b: sparse_solve_scipy(A.with_data(d), b,
                                              method="cg")
        r = measure_op(fwd, (A.data, b), n_runs=4, pipeline=1)
        rows.append(dict(op="solve_fwd", algorithm="scipy_cg_host", n=n,
                         nnz=nnz, rel_residual=None, **r))
        print(rows[-1], flush=True)
    except Exception as e:  # noqa: BLE001
        rows.append(dict(op="solve_fwd", algorithm="scipy_cg_host", n=n,
                         nnz=nnz, rel_residual=None, time_us=float("nan"),
                         time_std_us=float("nan"), mem_MB=None,
                         error=str(e)[:200]))
    write_csv("sparse_generic_solve_suite_results.csv", rows)


if __name__ == "__main__":
    main(small="--small" in sys.argv)
