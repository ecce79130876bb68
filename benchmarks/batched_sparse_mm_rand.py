"""Batched sparse_mm benchmark (reference
benchmarks/batched_sparse_mm_rand.py: batch in {4, 128}): vmap batching
vs a python loop over slices — the reference compares block-diag batching
vs looped native calls; here the comparison is native vmap vs loop.

Run: ``python -m benchmarks.batched_sparse_mm_rand [--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_mm
from torchsparsegradutils_tpu.ops.spmm import _elem
from torchsparsegradutils_tpu.utils import rand_sparse

from .benchmark_utils import measure_op, write_csv


def main(small: bool = False):
    n, nnz = (1024, 4096) if small else (8192, 65_536)
    m_rhs = 64
    key = jax.random.PRNGKey(0)
    rows = []
    for batch in (4, 32):
        A = rand_sparse(key, (batch, n, n), nnz, shared_pattern=True)
        B = jax.random.normal(jax.random.fold_in(key, 1),
                              (batch, n, m_rhs))
        r = measure_op(lambda d, B: sparse_mm(A.with_data(d), B),
                       (A.data, B), with_memory=False)
        rows.append(dict(op="batched_vmap", batch=batch, n=n, nnz=nnz,
                         rhs=m_rhs, **r))
        A0 = _elem(A, 0)

        def looped(d, B):
            return jnp.stack([
                sparse_mm(A0.with_data(d[i]), B[i]) for i in range(batch)])

        r = measure_op(looped, (A.data, B), with_memory=False)
        rows.append(dict(op="batched_loop", batch=batch, n=n, nnz=nnz,
                         rhs=m_rhs, **r))
        bwd = jax.grad(lambda d, B: (sparse_mm(A.with_data(d), B) ** 2
                                     ).sum())
        r = measure_op(bwd, (A.data, B), with_memory=False)
        rows.append(dict(op="batched_vmap_bwd", batch=batch, n=n, nnz=nnz,
                         rhs=m_rhs, **r))
        print(*rows[-3:], sep="\n", flush=True)
    write_csv("batched_sparse_mm_rand_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
