"""sparse_triangular_solve benchmark (reference
benchmarks/sparse_triangular_solve_suitesparse.py shape: cfd2-scale
lower-triangular system, M=2 RHS): blocked back-substitution forward +
transpose-solve backward across block sizes.

Run: ``python -m benchmarks.sparse_triangular_solve_suite [--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_triangular_solve
from torchsparsegradutils_tpu.utils import rand_sparse_tri

from .benchmark_utils import measure_op, write_csv


def main(small: bool = False):
    n, nnz, m = (4096, 20_000, 2) if small else (123_440, 3_087_898 // 2, 2)
    key = jax.random.PRNGKey(0)
    A = rand_sparse_tri(key, (n, n), nnz, upper=False, layout="csr")
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, m))
    rows = []
    for bs in (128, 256):
        fwd = lambda d, B: sparse_triangular_solve(
            A.with_data(d), B, upper=False, block_size=bs)
        r = measure_op(fwd, (A.data, B), n_runs=6, pipeline=2,
                       with_memory=False)
        rows.append(dict(op="tri_solve_fwd", block_size=bs, n=n, nnz=nnz,
                         rhs=m, **r))
        bwd = jax.grad(lambda d, B: (sparse_triangular_solve(
            A.with_data(d), B, upper=False, block_size=bs) ** 2).sum())
        r = measure_op(bwd, (A.data, B), n_runs=6, pipeline=2,
                       with_memory=False)
        rows.append(dict(op="tri_solve_bwd", block_size=bs, n=n, nnz=nnz,
                         rhs=m, **r))
        print(rows[-2], rows[-1], sep="\n", flush=True)
    write_csv("sparse_triangular_solve_results.csv", rows)


if __name__ == "__main__":
    main(small="--small" in sys.argv)
