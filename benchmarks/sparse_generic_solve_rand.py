"""sparse_generic_solve over random SPD sizes (reference
benchmarks/sparse_generic_solve_rand.py): CG/MINRES forward and IFT
backward across problem sizes, random and stencil patterns.

Run: ``python -m benchmarks.sparse_generic_solve_rand [--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_generic_solve
from torchsparsegradutils_tpu.solvers import (LinearCGSettings,
                                              MINRESSettings, linear_cg,
                                              minres)
from torchsparsegradutils_tpu.utils import make_spd_sparse
from torchsparsegradutils_tpu.utils.random_sparse import make_spd_stencil

from .benchmark_utils import measure_chained, write_csv


def main(small: bool = False):
    sizes = [1 << 12] if small else [1 << 12, 1 << 14, 1 << 16]
    key = jax.random.PRNGKey(0)
    eps = jnp.float32(1e-9)
    rows = []
    solvers = [
        ("cg", linear_cg, dict(settings=LinearCGSettings(
            max_iter=150, rtol=1e-5))),
        ("minres", minres, dict(settings=MINRESSettings(
            max_iter=150, rtol=1e-5))),
    ]
    for n in sizes:
        mats = [
            ("random", make_spd_sparse(key, n, n + 2 * (4 * n),
                                       layout="csr")),
            ("stencil", make_spd_stencil(key, n, [1, 3, max(4, n >> 6)],
                                         layout="csr")),
        ]
        for label, A in mats:
            b = jax.random.normal(jax.random.fold_in(key, 1), (n,))
            for name, solver, kw in solvers:
                fwd = lambda d, bb: sparse_generic_solve(
                    A.with_data(d), bb, solve=solver,
                    transpose_solve=solver, **kw)
                r = measure_chained(lambda bb: bb + eps * fwd(A.data, bb),
                                    b, rep=4, n_meas=3)
                rows.append(dict(op="solve_fwd", algorithm=name,
                                 matrix=label, n=n, nnz=A.nnz, **r))
                bwd = jax.grad(lambda d: (sparse_generic_solve(
                    A.with_data(d), b, solve=solver,
                    transpose_solve=solver, **kw) ** 2).sum())
                r = measure_chained(lambda d: d + eps * bwd(d), A.data,
                                    rep=4, n_meas=3)
                rows.append(dict(op="solve_bwd", algorithm=name,
                                 matrix=label, n=n, nnz=A.nnz, **r))
                print(rows[-2], rows[-1], sep="\n", flush=True)
    write_csv("sparse_generic_solve_rand_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
