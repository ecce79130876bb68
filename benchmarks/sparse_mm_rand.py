"""sparse_mm over random sizes (reference benchmarks/sparse_mm_rand.py:
rows 2^10..2^18, nnz to 2^22): fwd/bwd across backends per size.

Run: ``python -m benchmarks.sparse_mm_rand [--small]``."""

from __future__ import annotations

import sys

import jax

from torchsparsegradutils_tpu import sparse_mm
from torchsparsegradutils_tpu.utils import rand_sparse

from .benchmark_utils import measure_op, write_csv


def main(small: bool = False):
    sizes = [(1 << 10, 1 << 12)] if small else [
        (1 << 10, 1 << 12), (1 << 13, 1 << 16), (1 << 16, 1 << 20),
        (1 << 17, 1 << 22)]
    m_rhs = 64
    key = jax.random.PRNGKey(0)
    rows = []
    for n, nnz in sizes:
        A = rand_sparse(key, (n, n), nnz, layout="csr")
        B = jax.random.normal(jax.random.fold_in(key, 1), (n, m_rhs))
        for backend in ("pallas", "xla"):
            if backend == "pallas" and jax.default_backend() not in (
                    "tpu", "axon"):
                continue
            r = measure_op(
                lambda d, B: sparse_mm(A.with_data(d), B, backend=backend),
                (A.data, B))
            rows.append(dict(op="fwd", backend=backend, n=n, nnz=nnz,
                             rhs=m_rhs, **r))
            r = measure_op(
                jax.grad(lambda d, B: (sparse_mm(
                    A.with_data(d), B, backend=backend) ** 2).sum(),
                    argnums=(0, 1)),
                (A.data, B))
            rows.append(dict(op="bwd", backend=backend, n=n, nnz=nnz,
                             rhs=m_rhs, **r))
            print(rows[-2], rows[-1], sep="\n", flush=True)
    write_csv("sparse_mm_rand_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
