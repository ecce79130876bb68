"""sparse_generic_lstsq tests: forward vs dense lstsq, Golub-Pereyra
gradient parity at the nnz mask (mirrors reference
tests/test_sparse_lstsq.py archetypes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import sparse_generic_lstsq
from torchsparsegradutils_tpu.solvers import LSMRSettings, lsmr
from torchsparsegradutils_tpu.utils import rand_sparse

from test_config import LAYOUTS

M, N = 30, 10
TIGHT = LSMRSettings(max_iter=800, atol=1e-10, btol=1e-10)


def _tight_lstsq(A, B):
    return lsmr(A, B, settings=TIGHT)[0]


def _tight_transpose(A, B):
    return lsmr(A.T, B, settings=TIGHT)[0]


@pytest.fixture(params=LAYOUTS)
def layout(request):
    return request.param


def _tall(key, layout):
    return rand_sparse(key, (M, N), 90, layout=layout)


def test_forward_vs_dense(key, layout):
    A = _tall(key, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (M, 3))
    x = sparse_generic_lstsq(A, B, _tight_lstsq, _tight_transpose)
    ref, *_ = jnp.linalg.lstsq(A.todense(), B)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)


def test_vector_rhs(key, layout):
    A = _tall(key, layout)
    b = jax.random.normal(jax.random.fold_in(key, 1), (M,))
    x = sparse_generic_lstsq(A, b, _tight_lstsq, _tight_transpose)
    assert x.shape == (N,)
    ref, *_ = jnp.linalg.lstsq(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)


def test_grad_parity_vs_dense(key, layout):
    A = _tall(key, layout)
    kB, kG = jax.random.split(jax.random.fold_in(key, 1))
    B = jax.random.normal(kB, (M, 2))
    G = jax.random.normal(kG, (N, 2))
    coo = A.tocoo()
    rows, cols = coo.rows_np(), coo.cols_np()

    def loss_sparse(d, B):
        x = sparse_generic_lstsq(A.with_data(d), B, _tight_lstsq,
                                 _tight_transpose)
        return (x * G).sum()

    def loss_dense(Ad, B):
        x, *_ = jnp.linalg.lstsq(Ad, B)
        return (x * G).sum()

    gA_s, gB_s = jax.grad(loss_sparse, argnums=(0, 1))(A.data, B)
    gA_d, gB_d = jax.grad(loss_dense, argnums=(0, 1))(A.todense(), B)
    if A.layout == "csr":
        mask = np.asarray(gA_d)[A.rows_np(), A.cols_np()]
    else:
        mask = np.asarray(gA_d)[rows, cols]
    np.testing.assert_allclose(np.asarray(gA_s), mask, rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gB_s), np.asarray(gB_d),
                               rtol=5e-2, atol=5e-3)


def test_default_solver(key, layout):
    A = _tall(key, layout)
    b = jax.random.normal(jax.random.fold_in(key, 1), (M,))
    x = sparse_generic_lstsq(A, b)
    ref, *_ = jnp.linalg.lstsq(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=5e-2,
                               atol=5e-3)


def test_validation(key, layout):
    A = _tall(key, layout)
    with pytest.raises(ValueError, match="tall"):
        sparse_generic_lstsq(rand_sparse(key, (5, 9), 12, layout=layout),
                             jnp.ones(5))
    with pytest.raises(ValueError, match="incompatible shapes"):
        sparse_generic_lstsq(A, jnp.ones(M + 1))
    with pytest.raises(TypeError, match="must be SparseCOO"):
        sparse_generic_lstsq(jnp.ones((M, N)), jnp.ones(M))
