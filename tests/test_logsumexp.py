"""sparse_logsumexp / sparse_bidir_logsumexp tests: dense equivalence
(include_zeros=True), support-mask semantics, -inf handling, batched,
gradients through stored values, bidir consistency (mirrors reference
tests/test_sparse_logsumexp.py archetypes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import (
    SparseCOO,
    sparse_bidir_logsumexp,
    sparse_logsumexp,
)
from torchsparsegradutils_tpu.utils import rand_sparse

from test_config import LAYOUTS


@pytest.fixture(params=LAYOUTS)
def layout(request):
    return request.param


def _fixed_matrix(layout):
    """Deterministic matrix with an all-zero row and column (reference
    test fixture pattern, test_sparse_logsumexp.py:99-106)."""
    row = np.array([0, 1, 1, 3])
    col = np.array([1, 0, 2, 1])
    data = jnp.array([1.0, 2.0, 3.0, -1.0])
    coo = SparseCOO(row, col, data, (4, 4))  # row 2 and col 3 are empty
    return coo if layout == "coo" else coo.tocsr()


def _assert_close_inf(a, b, **kw):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape
    fin = np.isfinite(b)
    assert (np.isneginf(a) == np.isneginf(b)).all()
    np.testing.assert_allclose(a[fin], b[fin], **kw)


@pytest.mark.parametrize("dim", [0, 1, -1, -2, (0, 1)])
@pytest.mark.parametrize("keepdim", [False, True])
def test_dense_equivalence(layout, dim, keepdim):
    sp = _fixed_matrix(layout)
    out = sparse_logsumexp(sp, dim, keepdim=keepdim, include_zeros=True)
    ref = jax.scipy.special.logsumexp(sp.todense(), axis=dim, keepdims=keepdim)
    _assert_close_inf(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dim", [0, 1])
def test_exclude_zeros(layout, dim):
    sp = _fixed_matrix(layout)
    out = sparse_logsumexp(sp, dim, include_zeros=False)
    dense = np.asarray(sp.todense())
    mask = np.zeros_like(dense, dtype=bool)
    mask[sp.rows_np() if layout == "coo" else sp.tocoo().rows_np(),
         sp.cols_np() if layout == "coo" else sp.tocoo().cols_np()] = True
    masked = np.where(mask, dense, -np.inf)
    ref = jax.scipy.special.logsumexp(jnp.asarray(masked), axis=dim)
    _assert_close_inf(out, ref, rtol=1e-6, atol=1e-6)


def test_random_dense_equivalence(key, layout):
    sp = rand_sparse(key, (16, 12), 40, layout=layout)
    for dim in (0, 1, (0, 1)):
        out = sparse_logsumexp(sp, dim)
        ref = jax.scipy.special.logsumexp(sp.todense(), axis=dim)
        _assert_close_inf(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dim", [1, 2, (1, 2)])
@pytest.mark.parametrize("shared", [False, True])
def test_batched(key, layout, dim, shared):
    sp = rand_sparse(key, (3, 8, 6), 12, layout=layout,
                     shared_pattern=shared)
    out = sparse_logsumexp(sp, dim)
    ref = jax.scipy.special.logsumexp(sp.todense(), axis=dim)
    _assert_close_inf(out, ref, rtol=1e-5, atol=1e-6)


def test_batch_dim_unreducible(key, layout):
    sp = rand_sparse(key, (3, 4, 4), 5, layout=layout)
    with pytest.raises(NotImplementedError, match="batch dimension"):
        sparse_logsumexp(sp, 0)


def test_dim_validation(layout):
    sp = _fixed_matrix(layout)
    with pytest.raises(IndexError, match="out of range"):
        sparse_logsumexp(sp, 5)
    with pytest.raises(ValueError, match="repeated"):
        sparse_logsumexp(sp, (0, -2))
    with pytest.raises(ValueError, match="empty"):
        sparse_logsumexp(sp, ())


def test_inf_values(layout):
    row = np.array([0, 0, 1])
    col = np.array([0, 1, 1])
    data = jnp.array([jnp.inf, 1.0, -jnp.inf])
    coo = SparseCOO(row, col, data, (2, 2))
    sp = coo if layout == "coo" else coo.tocsr()
    out = sparse_logsumexp(sp, 1, include_zeros=False)
    assert np.isposinf(np.asarray(out)[0])
    assert np.isneginf(np.asarray(out)[1])


def test_grad_matches_dense(key, layout):
    sp = rand_sparse(key, (10, 8), 25, layout=layout)
    rows = sp.rows_np() if layout == "coo" else sp.tocoo().rows_np()
    cols = sp.cols_np() if layout == "coo" else sp.tocoo().cols_np()

    def f_sparse(d):
        return sparse_logsumexp(sp.with_data(d), 1).sum()

    def f_dense(d):
        dense = jnp.zeros((10, 8)).at[rows, cols].add(d)
        return jax.scipy.special.logsumexp(dense, axis=1).sum()

    gs = jax.grad(f_sparse)(sp.data)
    gd = jax.grad(f_dense)(sp.data)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-5,
                               atol=1e-6)
    assert np.isfinite(np.asarray(gs)).all()


def test_grad_no_nan_on_empty_groups(layout):
    sp = _fixed_matrix(layout)  # has empty row/col
    g = jax.grad(lambda d: jnp.where(
        jnp.isfinite(sparse_logsumexp(sp.with_data(d), 1,
                                      include_zeros=False)),
        sparse_logsumexp(sp.with_data(d), 1, include_zeros=False),
        0.0).sum())(sp.data)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("include_zeros", [False, True])
def test_bidir_matches_two_calls(key, layout, include_zeros):
    sp = rand_sparse(key, (9, 7), 20, layout=layout)
    col_lse, row_lse = sparse_bidir_logsumexp(sp,
                                              include_zeros=include_zeros)
    _assert_close_inf(col_lse,
                      sparse_logsumexp(sp, 0, include_zeros=include_zeros),
                      rtol=1e-6)
    _assert_close_inf(row_lse,
                      sparse_logsumexp(sp, 1, include_zeros=include_zeros),
                      rtol=1e-6)


@pytest.mark.parametrize("include_zeros", [False, True])
def test_bidir_fused_pallas(key, layout, include_zeros):
    # the fused single-traversal path (kernels/grid_lse.py:bidir_grid_fns)
    # runs in interpret mode under backend="pallas": forward equivalence
    # to the two-call reference AND gradient parity through both outputs
    sp = rand_sparse(key, (33, 21), 140, layout=layout)
    col_lse, row_lse = sparse_bidir_logsumexp(
        sp, include_zeros=include_zeros, backend="pallas")
    _assert_close_inf(col_lse,
                      sparse_logsumexp(sp, 0, include_zeros=include_zeros,
                                       backend="xla"), rtol=1e-6)
    _assert_close_inf(row_lse,
                      sparse_logsumexp(sp, 1, include_zeros=include_zeros,
                                       backend="xla"), rtol=1e-6)

    def loss(d, backend):
        c, r = sparse_bidir_logsumexp(sp.with_data(d),
                                      include_zeros=include_zeros,
                                      backend=backend)
        return (jnp.where(jnp.isfinite(c), c, 0.0).sum()
                + 2.0 * jnp.where(jnp.isfinite(r), r, 0.0).sum())

    g_fused = jax.grad(loss)(sp.data, "pallas")
    g_ref = jax.grad(loss)(sp.data, "xla")
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_bidir_batched(key, layout):
    sp = rand_sparse(key, (3, 6, 9), 11, layout=layout)
    col_lse, row_lse = sparse_bidir_logsumexp(sp)
    _assert_close_inf(col_lse, sparse_logsumexp(sp, 1), rtol=1e-6)
    _assert_close_inf(row_lse, sparse_logsumexp(sp, 2), rtol=1e-6)


def test_bidir_padded_layout(key, layout):
    sp = rand_sparse(key, (6, 9), 14, layout=layout)
    padded = sparse_bidir_logsumexp(sp, output_layout="padded")
    assert padded.shape == (2, 9)
    col_lse, row_lse = sparse_bidir_logsumexp(sp)
    _assert_close_inf(padded[0], col_lse, rtol=1e-6)
    _assert_close_inf(padded[1, :6], row_lse, rtol=1e-6)
    assert np.isneginf(np.asarray(padded)[1, 6:]).all()


def test_bidir_validation(key, layout):
    sp = rand_sparse(key, (4, 4), 5, layout=layout)
    with pytest.raises(NotImplementedError, match="nested"):
        sparse_bidir_logsumexp(sp, output_layout="nested")
    with pytest.raises(ValueError, match="unknown output_layout"):
        sparse_bidir_logsumexp(sp, output_layout="bogus")
    with pytest.raises(ValueError, match="keepdim"):
        sparse_bidir_logsumexp(sp, keepdim=True, output_layout="padded")


def test_bidir_keepdim(key, layout):
    sp = rand_sparse(key, (5, 7), 9, layout=layout)
    col_lse, row_lse = sparse_bidir_logsumexp(sp, keepdim=True)
    assert col_lse.shape == (1, 7)
    assert row_lse.shape == (5, 1)


def test_jit(key, layout):
    sp = rand_sparse(key, (8, 8), 16, layout=layout)
    out = jax.jit(lambda s: sparse_logsumexp(s, 1))(sp)
    ref = jax.scipy.special.logsumexp(sp.todense(), axis=1)
    _assert_close_inf(out, ref, rtol=1e-6)


class TestCscAcceptance:
    """CSC input parity (reference sparse_logsumexp.py:76-102)."""

    def _csc(self, key, n=40, m=30):
        import numpy as np
        from torchsparsegradutils_tpu.types import SparseCSC
        rng = np.random.default_rng(7)
        dense = np.where(rng.random((n, m)) < 0.2,
                         rng.normal(size=(n, m)), 0.0).astype(np.float32)
        import scipy.sparse as sps
        M = sps.csc_matrix(dense)
        A = SparseCSC(M.indptr, M.indices, jnp.asarray(M.data), (n, m))
        return A, jnp.asarray(dense), jnp.asarray(dense != 0)

    @pytest.mark.parametrize("dim", [0, 1, (0, 1)])
    def test_matches_dense(self, key, dim):
        A, dense, mask = self._csc(key)
        out = sparse_logsumexp(A, dim=dim)
        ref = jax.scipy.special.logsumexp(dense, axis=dim)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_keepdim_and_support_mask(self, key):
        A, dense, mask = self._csc(key)
        out = sparse_logsumexp(A, dim=0, keepdim=True, include_zeros=False)
        ref = jax.scipy.special.logsumexp(
            jnp.where(mask, dense, -jnp.inf), axis=0, keepdims=True)
        fin = jnp.isfinite(ref)
        np.testing.assert_allclose(jnp.where(fin, out, 0),
                                   jnp.where(fin, ref, 0), rtol=1e-5)
        assert out.shape == (1, dense.shape[1])

    def test_bidir(self, key):
        from torchsparsegradutils_tpu import sparse_bidir_logsumexp
        A, dense, _ = self._csc(key)
        c, r = sparse_bidir_logsumexp(A)
        np.testing.assert_allclose(
            c, jax.scipy.special.logsumexp(dense, axis=0), rtol=1e-5)
        np.testing.assert_allclose(
            r, jax.scipy.special.logsumexp(dense, axis=1), rtol=1e-5)
        padded = sparse_bidir_logsumexp(A, output_layout="padded")
        G = max(dense.shape)
        assert padded.shape == (2, G)
        np.testing.assert_allclose(padded[0, :dense.shape[1]], c, rtol=1e-6)
        np.testing.assert_allclose(padded[1, :dense.shape[0]], r, rtol=1e-6)
