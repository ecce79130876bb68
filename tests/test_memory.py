"""Memory-behaviour tests (reference archetype: CUDA peak-memory
assertions, tests/test_sparse_matmul.py:232-292): the sparse backward must
stay O(nnz) where the dense gradient would be O(n^2).  Uses XLA's compiled
memory analysis (argument + temp + output bytes) as the device-agnostic
peak estimate."""

import jax
import numpy as np

from torchsparsegradutils_tpu import sparse_mm
from torchsparsegradutils_tpu.utils import rand_sparse


def _compiled_bytes(fn, *args):
    ma = jax.jit(fn).lower(*args).compile().memory_analysis()
    return (getattr(ma, "temp_size_in_bytes", 0)
            + getattr(ma, "output_size_in_bytes", 0)
            + getattr(ma, "argument_size_in_bytes", 0))


def test_sparse_backward_is_onnz_memory(key):
    n, nnz, p = 2048, 8192, 16
    A = rand_sparse(key, (n, n), nnz)
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, p))

    def sparse_bwd(d, B):
        return jax.grad(lambda d, B: sparse_mm(A.with_data(d), B).sum(),
                        argnums=(0, 1))(d, B)

    def dense_bwd(Ad, B):
        return jax.grad(lambda Ad, B: (Ad @ B).sum(), argnums=(0, 1))(Ad, B)

    sparse_bytes = _compiled_bytes(sparse_bwd, A.data, B)
    dense_bytes = _compiled_bytes(dense_bwd, A.todense(), B)
    # dense gradA materialises n*n floats; sparse stays O(nnz + n*p)
    assert sparse_bytes < dense_bytes / 4, (sparse_bytes, dense_bytes)


def test_no_growth_across_iterations(key):
    """100 repeated applications do not grow live memory (reference
    memory-stability archetype, test_sparse_matmul.py:341-360)."""
    A = rand_sparse(key, (256, 256), 1024)
    B = jax.random.normal(jax.random.fold_in(key, 1), (256, 8))
    f = jax.jit(lambda d, B: sparse_mm(A.with_data(d), B))
    d = A.data
    out0 = f(d, B)
    live0 = len(jax.live_arrays())
    for _ in range(100):
        out = f(d, B)
    out.block_until_ready()
    del out, out0
    assert len(jax.live_arrays()) <= live0 + 4
