"""sparse_mm over random sizes (reference benchmarks/sparse_mm_rand.py:
rows 2^10..2^18, nnz to 2^22): fwd / fwd+bwd step across backends per
size — the small-size overhead story (reference BASELINE row: 70 µs
custom vs 56 µs native at 1024²/4096 nnz).

Chained-dependency timing (measure_chained): on the tunnelled TPU the
old pipelined ``measure_op`` overlapped dispatches, flattering small
sizes by up to the full ~30 ms round trip.

Run: ``python -m benchmarks.sparse_mm_rand [--small] [--cpu]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_mm
from torchsparsegradutils_tpu.utils import rand_sparse

from .benchmark_utils import measure_chained, write_csv


def main(small: bool = False):
    sizes = [(1 << 10, 1 << 12)] if small else [
        (1 << 10, 1 << 12), (1 << 12, 1 << 14), (1 << 14, 1 << 18),
        (1 << 16, 1 << 20), (1 << 17, 1 << 22), (1 << 18, 1 << 22)]
    m_rhs = 64
    key = jax.random.PRNGKey(0)
    rows = []
    for n, nnz in sizes:
        A = rand_sparse(key, (n, n), nnz, layout="csr")
        B = jax.random.normal(jax.random.fold_in(key, 1), (n, m_rhs))
        eps = jnp.float32(1e-12)
        # more reps at small sizes so the per-step figure resolves under
        # the tunnel's ~30 ms dispatch overhead
        rep = max(8, min(256, (1 << 22) // max(nnz, 1)))
        for backend in ("pallas", "xla"):
            if backend == "pallas" and jax.default_backend() not in (
                    "tpu", "axon"):
                continue

            def make_fwd(d):
                Ad = A.with_data(d)
                return lambda b: b + eps * sparse_mm(Ad, b,
                                                     backend=backend)

            r = measure_chained(None, B, rep=rep, n_meas=4,
                                prepare=make_fwd, prep_args=(A.data,))
            rows.append(dict(op="fwd", backend=backend, n=n, nnz=nnz,
                             rhs=m_rhs, rep=rep, **r))

            grad = jax.grad(
                lambda d, b: (sparse_mm(A.with_data(d), b,
                                        backend=backend) ** 2).sum(),
                argnums=(0, 1))

            def step(db):
                d, b = db
                gd, gb = grad(d, b)
                return (d + eps * gd, b + eps * gb)

            r = measure_chained(step, (A.data, B), rep=rep, n_meas=4)
            rows.append(dict(op="fwd_bwd", backend=backend, n=n, nnz=nnz,
                             rhs=m_rhs, rep=rep, **r))
            print(rows[-2], rows[-1], sep="\n", flush=True)
        write_csv("sparse_mm_rand_results.csv", rows)
    write_csv("sparse_mm_rand_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    args = set(sys.argv[1:])
    if "--cpu" in args:
        jax.config.update("jax_platforms", "cpu")
    main(small="--small" in args)
