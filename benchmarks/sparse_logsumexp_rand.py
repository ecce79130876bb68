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

from .benchmark_utils import measure_chained, write_csv


def main(small: bool = False):
    # chained-dependency timing (round 5): the old pipelined measure_op
    # rows overlapped dispatches and understated per-call cost on the
    # tunnelled TPU (CLAUDE.md); every step here feeds d back through an
    # eps-weighted reduction of the outputs, like the suitesparse suite.
    sizes = [(1 << 12, 1 << 14)] if small else [
        (1 << 14, 1 << 18), (1 << 17, 1 << 21), (1 << 20, 1 << 22)]
    key = jax.random.PRNGKey(0)
    rows = []

    def nansum(x):
        return jnp.where(jnp.isfinite(x), x, 0.0).sum()

    for n, nnz in sizes:
        A = rand_sparse(key, (n, n), nnz, layout="csr")
        eps = jnp.float32(1e-12)
        for name, step in [
            ("lse_dim1", lambda d: d + eps * nansum(
                sparse_logsumexp(A.with_data(d), 1))),
            ("lse_two_calls", lambda d: d + eps * (
                nansum(sparse_logsumexp(A.with_data(d), 0))
                + nansum(sparse_logsumexp(A.with_data(d), 1)))),
            ("bidir", lambda d: d + eps * sum(
                nansum(x) for x in sparse_bidir_logsumexp(A.with_data(d)))),
        ]:
            r = measure_chained(step, A.data, rep=6, n_meas=4)
            rows.append(dict(op=name, n=n, nnz=nnz, **r))
            print(rows[-1], flush=True)
        bwd = jax.grad(lambda d: sum(
            nansum(x) for x in sparse_bidir_logsumexp(A.with_data(d))))
        r = measure_chained(lambda d: d + eps * bwd(d), A.data,
                            rep=6, n_meas=4)
        rows.append(dict(op="bidir_bwd", n=n, nnz=nnz, **r))
        print(rows[-1], flush=True)
    write_csv("sparse_logsumexp_rand_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
