"""Batched sparse_mm benchmark (reference
benchmarks/batched_sparse_mm_rand.py: batch in {4, 128}, sizes swept):
vmap batching vs a python loop over slices — the reference compares
block-diag batching vs looped native calls; here the comparison is
native vmap vs loop.

Timing is chained-dependent steps (``measure_chained``) — the round-4
CSV used the pipelined ``measure_op`` and its vmap row carried a
sigma of 8.3 ms on a 22 ms reading (dispatch overlap noise), which is
exactly the failure mode CLAUDE.md documents for the tunnelled TPU.

Run: ``python -m benchmarks.batched_sparse_mm_rand [--small] [--cpu]``.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_mm
from torchsparsegradutils_tpu.ops.spmm import _elem
from torchsparsegradutils_tpu.utils import rand_sparse

from .benchmark_utils import measure_chained, write_csv


def _measure(fn, d0, B0, eps):
    # fn(d, B) -> (b, n, p); chain through B so steps depend
    def prep(d):
        return lambda B: B + eps * fn(d, B)

    return measure_chained(None, B0, rep=8, n_meas=4,
                           prepare=prep, prep_args=(d0,))


def main(small: bool = False, sizes=None, batches=(4, 128)):
    m_rhs = 64
    key = jax.random.PRNGKey(0)
    rows = []
    eps = jnp.float32(1e-12)
    if sizes is None:
        sizes = ((1024,) if small else (1024, 4096, 8192, 16384))
    for batch in batches:
        for n in sizes:
            nnz = n * 8  # reference density regime (nnz = 4..8 per row)
            A = rand_sparse(key, (batch, n, n), nnz, shared_pattern=True)
            B = jax.random.normal(jax.random.fold_in(key, 1),
                                  (batch, n, m_rhs))

            r = _measure(lambda d, B: sparse_mm(A.with_data(d), B),
                         A.data, B, eps)
            rows.append(dict(op="batched_vmap", batch=batch, n=n, nnz=nnz,
                             rhs=m_rhs, **r))
            A0 = _elem(A, 0)

            def looped(d, B):
                return jnp.stack([
                    sparse_mm(A0.with_data(d[i]), B[i])
                    for i in range(batch)])

            r = _measure(looped, A.data, B, eps)
            rows.append(dict(op="batched_loop", batch=batch, n=n, nnz=nnz,
                             rhs=m_rhs, **r))

            grad = jax.grad(
                lambda d, B: (sparse_mm(A.with_data(d), B) ** 2).sum(),
                argnums=(0, 1))

            def bstep(dB):
                d, b = dB
                gd, gb = grad(d, b)
                return (d + eps * gd, b + eps * gb)

            r = measure_chained(bstep, (A.data, B), rep=8, n_meas=4)
            rows.append(dict(op="batched_vmap_fwd_bwd", batch=batch, n=n,
                             nnz=nnz, rhs=m_rhs, **r))
            print(*rows[-3:], sep="\n", flush=True)
            write_csv("batched_sparse_mm_rand_results.csv", rows)
    write_csv("batched_sparse_mm_rand_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main(small="--small" in sys.argv,
         batches=(4,) if "--small" in sys.argv else (4, 128))
