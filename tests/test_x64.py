"""float64 / int64 coverage (reference index-dtype and value-dtype duality:
tests parametrize f32/f64 and i32/i64; here f64 is gated behind x64 mode).
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchsparsegradutils_tpu import SparseCOO, sparse_mm, sparse_logsumexp
from torchsparsegradutils_tpu.utils import rand_sparse


def test_f64_spmm_grad(key, enable_x64):
    A32 = rand_sparse(key, (10, 8), 20)
    A = SparseCOO(A32.rows_np(), A32.cols_np(),
                  jnp.asarray(A32.data, jnp.float64), (10, 8))
    B = jax.random.normal(jax.random.fold_in(key, 1), (8, 3),
                          jnp.float64)
    out = sparse_mm(A, B)
    assert out.dtype == jnp.float64
    ref = A.todense() @ B
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12)
    g = jax.grad(lambda d: (sparse_mm(A.with_data(d), B) ** 2).sum())(
        A.data)
    gd = jax.grad(lambda Ad: ((Ad @ B) ** 2).sum())(A.todense())
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(gd)[A.rows_np(), A.cols_np()],
                               rtol=1e-11)


def test_i64_indices(key, enable_x64):
    A32 = rand_sparse(key, (6, 6), 10)
    A = SparseCOO(A32.rows_np().astype(np.int64),
                  A32.cols_np().astype(np.int64), A32.data, (6, 6))
    assert A.index_dtype() == np.int64
    B = jax.random.normal(key, (6, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(sparse_mm(A, B)),
                               np.asarray(A.todense() @ B), rtol=1e-5,
                               atol=1e-6)


def test_f64_logsumexp(key, enable_x64):
    A32 = rand_sparse(key, (8, 8), 14)
    A = SparseCOO(A32.rows_np(), A32.cols_np(),
                  jnp.asarray(A32.data, jnp.float64), (8, 8))
    out = sparse_logsumexp(A, 1)
    ref = jax.scipy.special.logsumexp(A.todense(), axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12)
