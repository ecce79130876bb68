"""Edge cases: empty matrices (nnz=0) and bf16 through the kernel paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import (
    SparseCOO,
    sparse_logsumexp,
    sparse_mm,
)
from torchsparsegradutils_tpu.utils import rand_sparse


def _empty(layout):
    coo = SparseCOO(np.zeros(0, np.int32), np.zeros(0, np.int32),
                    jnp.zeros(0), (4, 5))
    return coo if layout == "coo" else coo.tocsr()


@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_empty_spmm_and_grad(layout):
    A = _empty(layout)
    B = jnp.ones((5, 3))
    out = sparse_mm(A, B)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    g = jax.grad(lambda d: sparse_mm(A.with_data(d), B).sum())(A.data)
    assert g.shape == (0,)


@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_empty_logsumexp(layout):
    A = _empty(layout)
    out = sparse_logsumexp(A, 1)  # all-zero rows: log(5 * exp(0))
    np.testing.assert_allclose(np.asarray(out), np.log(5.0), rtol=1e-6)
    out0 = sparse_logsumexp(A, 1, include_zeros=False)
    assert np.isneginf(np.asarray(out0)).all()


def test_bf16_pallas_spmm(key):
    A = rand_sparse(key, (12, 10), 30).astype(jnp.bfloat16)
    B = jax.random.normal(jax.random.fold_in(key, 1), (10, 4),
                          jnp.bfloat16)
    out = sparse_mm(A, B, backend="pallas")
    assert out.dtype == jnp.bfloat16
    ref = (A.todense().astype(jnp.float32)
           @ B.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(ref), rtol=5e-2, atol=5e-2)
    gA = jax.grad(lambda d: sparse_mm(
        A.with_data(d), B, backend="pallas").astype(jnp.float32).sum()
    )(A.data)
    assert gA.dtype == jnp.bfloat16


def test_single_entry_matrix(key):
    A = SparseCOO(np.array([2]), np.array([1]), jnp.array([3.0]), (4, 4))
    B = jnp.eye(4)
    out = sparse_mm(A, B, backend="pallas")
    expect = np.zeros((4, 4))
    expect[2, 1] = 3.0
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)
