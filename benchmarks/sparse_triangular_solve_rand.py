"""sparse_triangular_solve over random sizes (reference
benchmarks/sparse_triangular_solve_rand.py): banded (DIA kernel) and
random (scan path) lower-triangular systems across sizes.

Run: ``python -m benchmarks.sparse_triangular_solve_rand [--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_triangular_solve
from torchsparsegradutils_tpu.utils import rand_sparse_tri
from torchsparsegradutils_tpu.utils.random_sparse import stencil_sparse

from .benchmark_utils import measure_chained, write_csv


def main(small: bool = False):
    sizes = [1 << 12] if small else [1 << 12, 1 << 15, 1 << 17]
    key = jax.random.PRNGKey(0)
    eps = jnp.float32(1e-12)
    rows = []
    for n in sizes:
        band = max(8, n >> 6)
        mats = [
            ("stencil", stencil_sparse(
                key, (n, n), [-band, -band + 1, -3, -1, 0],
                well_conditioned=True), "dia"),
            ("random", rand_sparse_tri(key, (n, n), min(8 * n, n * n // 4),
                                       upper=False, layout="csr"),
             "block"),
        ]
        B = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
        for label, A, algorithm in mats:
            fwd = lambda b: b + eps * sparse_triangular_solve(
                A, b, upper=False, algorithm=algorithm)
            r = measure_chained(fwd, B, rep=4, n_meas=3)
            rows.append(dict(op="tri_fwd", pattern=label,
                             algorithm=algorithm, n=n, nnz=A.nnz, **r))
            grad = jax.grad(lambda d: (sparse_triangular_solve(
                A.with_data(d), B, upper=False,
                algorithm=algorithm) ** 2).sum())
            r = measure_chained(lambda d: d + eps * grad(d), A.data,
                                rep=4, n_meas=3)
            rows.append(dict(op="tri_fwd_bwd", pattern=label,
                             algorithm=algorithm, n=n, nnz=A.nnz, **r))
            print(rows[-2], rows[-1], sep="\n", flush=True)
    write_csv("sparse_triangular_solve_rand_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
