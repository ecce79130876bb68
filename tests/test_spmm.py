"""sparse_mm / sddmm tests: forward equivalence vs dense, gradient parity at
the nnz mask, batched variants, jit/vmap, higher-order grads, optimization
smoke test (mirrors reference tests/test_sparse_matmul.py archetypes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import SparseCOO, sparse_mm, sddmm
from torchsparsegradutils_tpu.utils import rand_sparse

from test_config import LAYOUTS, tol


@pytest.fixture(params=LAYOUTS)
def layout(request):
    return request.param


def _mk(key, shape, nnz, layout, **kw):
    return rand_sparse(key, shape, nnz, layout=layout, **kw)


def test_forward_vs_dense(key, layout):
    kA, kB = jax.random.split(key)
    A = _mk(kA, (8, 6), 14, layout)
    B = jax.random.normal(kB, (6, 4))
    out = sparse_mm(A, B)
    ref = A.todense() @ B
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               **tol("direct", out.dtype))


def test_forward_jit(key, layout):
    kA, kB = jax.random.split(key)
    A = _mk(kA, (8, 6), 14, layout)
    B = jax.random.normal(kB, (6, 4))
    out = jax.jit(sparse_mm)(A, B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(A.todense() @ B),
                               **tol("direct", out.dtype))


def test_grad_parity_at_mask(key, layout):
    """gradA must equal the dense grad sampled at A's nonzeros, and gradB the
    full dense gradB (reference test_sparse_matmul.py:91-128)."""
    kA, kB, kG = jax.random.split(key, 3)
    A = _mk(kA, (8, 6), 14, layout)
    B = jax.random.normal(kB, (6, 4))
    G = jax.random.normal(kG, (8, 4))

    def loss_sparse(data, Bv):
        return (sparse_mm(A.with_data(data), Bv) * G).sum()

    def loss_dense(Ad, Bv):
        return ((Ad @ Bv) * G).sum()

    gA_s, gB_s = jax.grad(loss_sparse, argnums=(0, 1))(A.data, B)
    gA_d, gB_d = jax.grad(loss_dense, argnums=(0, 1))(A.todense(), B)
    rows, cols = A.rows_np(), A.cols_np()
    np.testing.assert_allclose(np.asarray(gA_s),
                               np.asarray(gA_d)[rows, cols],
                               **tol("grad", A.dtype))
    np.testing.assert_allclose(np.asarray(gB_s), np.asarray(gB_d),
                               **tol("grad", A.dtype))


def test_grad_container_cotangent(key, layout):
    """Differentiating w.r.t. the container itself yields a container grad."""
    kA, kB = jax.random.split(key)
    A = _mk(kA, (6, 6), 10, layout)
    B = jax.random.normal(kB, (6, 3))

    gA = jax.grad(lambda sp: sparse_mm(sp, B).sum())(A)
    assert type(gA) is type(A)
    gA_dense = jax.grad(lambda Ad: (Ad @ B).sum())(A.todense())
    np.testing.assert_allclose(np.asarray(gA.data),
                               np.asarray(gA_dense)[A.rows_np(), A.cols_np()],
                               **tol("grad", A.dtype))


@pytest.mark.parametrize("shared", [False, True])
def test_batched(key, layout, shared):
    kA, kB = jax.random.split(key)
    A = _mk(kA, (3, 7, 5), 11, layout, shared_pattern=shared)
    B = jax.random.normal(kB, (3, 5, 4))
    out = sparse_mm(A, B)
    ref = jnp.einsum("bij,bjk->bik", A.todense(), B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               **tol("direct", out.dtype))
    # batched grads
    g = jax.grad(lambda d: (sparse_mm(A.with_data(d), B) ** 2).sum())(A.data)
    assert g.shape == A.data.shape


def test_broadcast_batch(key, layout):
    kA, kB = jax.random.split(key)
    A = _mk(kA, (7, 5), 12, layout)
    B = jax.random.normal(kB, (3, 5, 4))
    out = sparse_mm(A, B)
    ref = jnp.einsum("ij,bjk->bik", A.todense(), B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               **tol("direct", out.dtype))
    A3 = _mk(kA, (3, 7, 5), 12, layout)
    out2 = sparse_mm(A3, jax.random.normal(kB, (5, 4)))
    assert out2.shape == (3, 7, 4)


def test_vmap_over_data(key, layout):
    kA, kB = jax.random.split(key)
    A = _mk(kA, (6, 5), 9, layout)
    B = jax.random.normal(kB, (5, 3))
    datas = jnp.stack([A.data, 2 * A.data, -A.data])
    outs = jax.vmap(lambda d: sparse_mm(A.with_data(d), B))(datas)
    for i, s in enumerate([1.0, 2.0, -1.0]):
        np.testing.assert_allclose(np.asarray(outs[i]),
                                   s * np.asarray(A.todense() @ B),
                                   **tol("direct", A.dtype))


def test_second_order_grad(key, layout):
    kA, kB = jax.random.split(key)
    A = _mk(kA, (5, 5), 8, layout)
    B = jax.random.normal(kB, (5, 2))

    def loss(data):
        out = sparse_mm(A.with_data(data), B)
        return (out ** 3).sum()

    def loss_dense(vals):
        Ad = jnp.zeros((5, 5)).at[A.rows_np(), A.cols_np()].add(vals)
        return ((Ad @ B) ** 3).sum()

    # custom_vjp supports reverse mode only -> hessian via jacrev(grad)
    h_s = jax.jacrev(jax.grad(loss))(A.data)
    h_d = jax.jacrev(jax.grad(loss_dense))(A.data)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_d), rtol=1e-3,
                               atol=1e-4)


def test_sddmm_matches_dense(key, layout):
    kA, kX, kY = jax.random.split(key, 3)
    A = _mk(kA, (7, 6), 13, layout)
    X = jax.random.normal(kX, (7, 5))
    Y = jax.random.normal(kY, (6, 5))
    out = sddmm(A, X, Y)
    assert type(out) is type(A)
    dense = X @ Y.T
    np.testing.assert_allclose(np.asarray(out.data),
                               np.asarray(dense)[out.rows_np(),
                                                 out.cols_np()],
                               **tol("direct", X.dtype))


def test_sddmm_expand_gather_parity(key, layout, monkeypatch):
    # the sorted-row expansion gather (narrow-RHS SDDMM X side) must
    # match the plain XLA row gather; forced on so the window kernel
    # runs in interpret mode off-TPU
    kA, kX, kY = jax.random.split(key, 3)
    A = _mk(kA, (300, 290), 2500, layout)
    X = jax.random.normal(kX, (300, 2))
    Y = jax.random.normal(kY, (290, 2))
    base = sddmm(A, X, Y).data
    monkeypatch.setenv("TSGU_EXPAND_GATHER", "force")
    from torchsparsegradutils_tpu.ops.spmm import _sorted_row_expand
    assert _sorted_row_expand(A, X) is not None
    forced = sddmm(A, X, Y).data
    np.testing.assert_allclose(np.asarray(forced), np.asarray(base),
                               rtol=1e-5, atol=1e-6)


def test_sddmm_grad(key, layout):
    kA, kX, kY = jax.random.split(key, 3)
    A = _mk(kA, (6, 5), 9, layout)
    X = jax.random.normal(kX, (6, 4))
    Y = jax.random.normal(kY, (5, 4))

    def f_sparse(X, Y):
        return (sddmm(A, X, Y).data ** 2).sum()

    def f_dense(X, Y):
        M = (X @ Y.T)[A.rows_np(), A.cols_np()]
        return (M ** 2).sum()

    gs = jax.grad(f_sparse, argnums=(0, 1))(X, Y)
    gd = jax.grad(f_dense, argnums=(0, 1))(X, Y)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   **tol("grad", X.dtype))


def test_optimization_smoke(key, layout):
    """3 SGD steps on A.data reduce the loss and change the values
    (reference test_sparse_matmul.py:295-338)."""
    kA, kB, kT = jax.random.split(key, 3)
    A = _mk(kA, (6, 5), 10, layout)
    B = jax.random.normal(kB, (5, 3))
    target = jax.random.normal(kT, (6, 3))

    def loss(d):
        return ((sparse_mm(A.with_data(d), B) - target) ** 2).mean()

    d = A.data
    l0 = loss(d)
    for _ in range(3):
        d = d - 0.1 * jax.grad(loss)(d)
    assert loss(d) < l0
    assert not np.allclose(np.asarray(d), np.asarray(A.data))


def test_validation_errors(key, layout):
    A = _mk(key, (4, 4), 6, layout)
    B = jnp.ones((4, 2))
    with pytest.raises(TypeError, match="must be SparseCOO or SparseCSR"):
        sparse_mm(jnp.ones((4, 4)), B)
    with pytest.raises(TypeError, match="must be a dense array"):
        sparse_mm(A, A)
    with pytest.raises(ValueError, match="inner dims"):
        sparse_mm(A, jnp.ones((5, 2)))
    with pytest.raises(ValueError, match="dtype mismatch"):
        sparse_mm(A, jnp.ones((4, 2), jnp.bfloat16))
    with pytest.raises(ValueError, match="batch dims disagree"):
        sparse_mm(_mk(key, (2, 4, 4), 6, layout), jnp.ones((3, 4, 2)))
