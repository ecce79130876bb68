"""sparse_logsumexp / sparse_bidir_logsumexp benchmark over random sizes
(reference benchmarks/sparse_logsumexp_rand.py + sparse_bidir_logsumexp_
rand.py: sizes to 2^20 rows / 2^22 nnz).  Reproduces headline claim #3:
one-traversal bidir beats two separate calls.

Run: ``python -m benchmarks.sparse_logsumexp_rand [--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_bidir_logsumexp, sparse_logsumexp
from torchsparsegradutils_tpu.utils import rand_sparse

from .benchmark_utils import measure_op, write_csv


def main(small: bool = False):
    sizes = [(1 << 12, 1 << 14)] if small else [
        (1 << 14, 1 << 18), (1 << 17, 1 << 21), (1 << 20, 1 << 22)]
    key = jax.random.PRNGKey(0)
    rows = []
    for n, nnz in sizes:
        A = rand_sparse(key, (n, n), nnz, layout="csr")
        for name, fn in [
            ("lse_dim1", lambda d: sparse_logsumexp(A.with_data(d), 1)),
            ("lse_two_calls", lambda d: (
                sparse_logsumexp(A.with_data(d), 0),
                sparse_logsumexp(A.with_data(d), 1))),
            ("bidir", lambda d: sparse_bidir_logsumexp(A.with_data(d))),
        ]:
            r = measure_op(fn, (A.data,))
            rows.append(dict(op=name, n=n, nnz=nnz, **r))
            print(rows[-1], flush=True)
        bwd = jax.grad(lambda d: sum(
            jnp.where(jnp.isfinite(x), x, 0.0).sum()
            for x in sparse_bidir_logsumexp(A.with_data(d))))
        r = measure_op(bwd, (A.data,))
        rows.append(dict(op="bidir_bwd", n=n, nnz=nnz, **r))
        print(rows[-1], flush=True)
    write_csv("sparse_logsumexp_rand_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
