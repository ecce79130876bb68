"""sparse_mm benchmark at SuiteSparse cfd2 scale (reference
benchmarks/sparse_mm_suite.py): N=123,440, nnz=3,087,898, M=128.

Compares this library's backends (pallas / xla / ell) forward and
sparsity-preserving backward.  Run: ``python -m benchmarks.sparse_mm_suite
[--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_mm
from torchsparsegradutils_tpu.utils import rand_sparse

from .benchmark_utils import measure_op, write_csv

N, NNZ, M = 123_440, 3_087_898, 128


def main(small: bool = False):
    n, nnz, m = (8192, 120_000, 128) if small else (N, NNZ, M)
    key = jax.random.PRNGKey(0)
    kA, kB, kG = jax.random.split(key, 3)
    B = jax.random.normal(kB, (n, m), jnp.float32)
    G = jax.random.normal(kG, (n, m), jnp.float32)
    rows = []
    for layout in ("csr", "coo"):
        A = rand_sparse(kA, (n, n), nnz, layout=layout)
        for backend in ("pallas", "xla", "ell"):
            if backend == "pallas" and jax.default_backend() not in (
                    "tpu", "axon"):
                continue
            fwd = lambda d, B: sparse_mm(A.with_data(d), B, backend=backend)
            r = measure_op(fwd, (A.data, B))
            rows.append(dict(op="sparse_mm_fwd", layout=layout,
                             backend=backend, n=n, nnz=nnz, rhs=m, **r))
            bwd = jax.grad(
                lambda d, B: (sparse_mm(A.with_data(d), B,
                                        backend=backend) * G).sum(),
                argnums=(0, 1))
            r = measure_op(bwd, (A.data, B))
            rows.append(dict(op="sparse_mm_bwd", layout=layout,
                             backend=backend, n=n, nnz=nnz, rhs=m, **r))
            print(rows[-2], rows[-1], sep="\n", flush=True)
    write_csv("sparse_mm_suite_results.csv", rows)


if __name__ == "__main__":
    main(small="--small" in sys.argv)
