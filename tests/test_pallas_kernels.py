"""Pallas chunk-kernel correctness (interpret mode on CPU): fwd SpMM,
SDDMM, fused backward pair, grads vs the XLA path, higher-order VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import sparse_mm, sddmm
from torchsparsegradutils_tpu.utils import rand_sparse

from test_config import LAYOUTS


@pytest.fixture(params=LAYOUTS)
def layout(request):
    return request.param


def _mk(key, shape, nnz, layout):
    return rand_sparse(key, shape, nnz, layout=layout)


def test_pallas_fwd_matches_xla(key, layout):
    A = _mk(key, (40, 30), 120, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (30, 8))
    out_p = sparse_mm(A, B, backend="pallas")
    out_x = sparse_mm(A, B, backend="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_pallas_fwd_wide_rhs(key, layout):
    A = _mk(key, (24, 50), 100, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (50, 130))  # pads 256
    out_p = sparse_mm(A, B, backend="pallas")
    np.testing.assert_allclose(np.asarray(out_p),
                               np.asarray(A.todense() @ B),
                               rtol=1e-4, atol=1e-5)


def test_pallas_sddmm(key, layout):
    A = _mk(key, (20, 25), 60, layout)
    X = jax.random.normal(jax.random.fold_in(key, 1), (20, 7))
    Y = jax.random.normal(jax.random.fold_in(key, 2), (25, 7))
    v_p = sddmm(A, X, Y, backend="pallas").data
    v_x = sddmm(A, X, Y, backend="xla").data
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-5,
                               atol=1e-6)


def test_pallas_fused_backward(key, layout):
    A = _mk(key, (30, 22), 90, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (22, 6))
    G = jax.random.normal(jax.random.fold_in(key, 2), (30, 6))

    def loss(d, B, backend):
        return (sparse_mm(A.with_data(d), B, backend=backend) * G).sum()

    gA_p, gB_p = jax.grad(lambda d, B: loss(d, B, "pallas"),
                          argnums=(0, 1))(A.data, B)
    gA_x, gB_x = jax.grad(lambda d, B: loss(d, B, "xla"),
                          argnums=(0, 1))(A.data, B)
    np.testing.assert_allclose(np.asarray(gA_p), np.asarray(gA_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gB_p), np.asarray(gB_x),
                               rtol=1e-4, atol=1e-5)


def test_pallas_second_order(key, layout):
    A = _mk(key, (12, 12), 30, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (12, 3))

    def loss(d, backend):
        return (sparse_mm(A.with_data(d), B, backend=backend) ** 3).sum()

    h_p = jax.jacrev(jax.grad(lambda d: loss(d, "pallas")))(A.data)
    h_x = jax.jacrev(jax.grad(lambda d: loss(d, "xla")))(A.data)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-3,
                               atol=1e-4)


def test_pallas_jit(key, layout):
    A = _mk(key, (16, 16), 40, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (16, 4))
    f = jax.jit(lambda sp, b: sparse_mm(sp, b, backend="pallas"))
    np.testing.assert_allclose(np.asarray(f(A, B)),
                               np.asarray(A.todense() @ B), rtol=1e-4,
                               atol=1e-5)


def test_pallas_empty_rows_and_skew(key, layout):
    """Patterns with empty rows and a dense row exercise the rank-based
    window logic."""
    row = np.array([0, 0, 0, 0, 0, 7, 19])
    col = np.array([0, 3, 5, 7, 9, 1, 2])
    from torchsparsegradutils_tpu import SparseCOO
    A = SparseCOO(row, col, jnp.arange(1.0, 8.0), (20, 10))
    if layout == "csr":
        A = A.tocsr()
    B = jax.random.normal(key, (10, 5))
    out = sparse_mm(A, B, backend="pallas")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(A.todense() @ B), rtol=1e-5,
                               atol=1e-6)
