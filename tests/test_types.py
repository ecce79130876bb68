"""Container tests: construction, dense round-trip, pytree/jit behaviour,
static-pattern caching semantics, conversions, transpose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import SparseCOO, SparseCSR
from torchsparsegradutils_tpu.types import StaticArray


def _rand_dense(key, shape, density=0.3):
    kv, km = jax.random.split(key)
    v = jax.random.normal(kv, shape)
    mask = jax.random.uniform(km, shape) < density
    return jnp.where(mask, v, 0.0)


def test_coo_roundtrip(key):
    x = _rand_dense(key, (7, 5))
    coo = SparseCOO.fromdense(x)
    np.testing.assert_allclose(np.asarray(coo.todense()), np.asarray(x))
    assert coo.layout == "coo"
    assert coo.shape == (7, 5)
    assert coo.pattern_static


def test_csr_roundtrip(key):
    x = _rand_dense(key, (6, 9))
    csr = SparseCSR.fromdense(x)
    np.testing.assert_allclose(np.asarray(csr.todense()), np.asarray(x))
    assert csr.layout == "csr"
    ip = csr.indptr_np()
    assert ip[0] == 0 and ip[-1] == csr.nnz
    # rows are sorted in CSR order
    assert (np.diff(csr.rows_np()) >= 0).all()


def test_batched_roundtrip(key):
    x = _rand_dense(key, (3, 5, 4))
    # equalize nnz per slice by padding
    nnz = max(int((np.asarray(x)[i] != 0).sum()) for i in range(3))
    coo = SparseCOO.fromdense(x, nnz=nnz)
    assert coo.shape == (3, 5, 4)
    np.testing.assert_allclose(np.asarray(coo.todense()), np.asarray(x),
                               atol=1e-7)
    csr = coo.tocsr()
    np.testing.assert_allclose(np.asarray(csr.todense()), np.asarray(x),
                               atol=1e-7)


def test_static_pattern_jit_cache(key):
    x = _rand_dense(key, (5, 5))
    coo = SparseCOO.fromdense(x)
    calls = []

    @jax.jit
    def f(sp):
        calls.append(1)
        return sp.todense().sum()

    f(coo)
    f(coo.with_data(coo.data * 2))  # same pattern -> cache hit
    assert len(calls) == 1
    # rebuilt container with identical pattern content also hits the cache
    coo2 = SparseCOO(coo.rows_np(), coo.cols_np(), coo.data, coo.shape)
    f(coo2)
    assert len(calls) == 1
    # different pattern -> recompile
    r = coo.rows_np().copy()
    c = coo.cols_np().copy()
    c[0] = (c[0] + 1) % 5
    f(SparseCOO(r, c, coo.data, coo.shape))
    assert len(calls) == 2


def test_dynamic_pattern_leaves(key):
    x = _rand_dense(key, (5, 5))
    st = SparseCOO.fromdense(x)
    dyn = SparseCOO(st.rows_np(), st.cols_np(), st.data, st.shape,
                    pattern_static=False)
    leaves = jax.tree_util.tree_leaves(dyn)
    assert len(leaves) == 3  # data + row + col
    leaves_s = jax.tree_util.tree_leaves(st)
    assert len(leaves_s) == 1  # data only

    @jax.jit
    def f(sp):
        return sp.todense()

    np.testing.assert_allclose(np.asarray(f(dyn)), np.asarray(x))


def test_transpose(key):
    x = _rand_dense(key, (4, 6))
    coo = SparseCOO.fromdense(x)
    np.testing.assert_allclose(np.asarray(coo.T.todense()),
                               np.asarray(x).T)
    csr = coo.tocsr()
    t = csr.T
    assert isinstance(t, SparseCSR)
    np.testing.assert_allclose(np.asarray(t.todense()), np.asarray(x).T)


def test_with_data_grad(key):
    x = _rand_dense(key, (4, 4))
    coo = SparseCOO.fromdense(x)

    def loss(d):
        return (coo.with_data(d).todense() ** 2).sum()

    g = jax.grad(loss)(coo.data)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(coo.data),
                               rtol=1e-6)


def test_static_array_hash_equality():
    a = StaticArray(np.array([1, 2, 3]))
    b = StaticArray(np.array([1, 2, 3]))
    c = StaticArray(np.array([1, 2, 4]))
    assert a == b and hash(a) == hash(b)
    assert a != c


def test_validation_errors():
    with pytest.raises(ValueError, match="integer dtype"):
        SparseCOO(np.array([0.5]), np.array([0]), jnp.ones(1), (2, 2))
    with pytest.raises(ValueError, match="entries but data"):
        SparseCOO(np.array([0, 1]), np.array([0, 1]), jnp.ones(3), (2, 2))
    with pytest.raises(ValueError, match="indptr last dim"):
        SparseCSR(np.array([0, 1]), np.array([0]), jnp.ones(1), (2, 2))


def test_fromdense_nnz_padding(key):
    x = jnp.zeros((3, 3)).at[0, 1].set(2.0)
    coo = SparseCOO.fromdense(x, nnz=4)
    assert coo.nnz == 4
    np.testing.assert_allclose(np.asarray(coo.todense()), np.asarray(x))


def test_sort_indices(key):
    row = np.array([2, 0, 1, 0])
    col = np.array([1, 2, 0, 0])
    data = jnp.array([1.0, 2.0, 3.0, 4.0])
    coo = SparseCOO(row, col, data, (3, 3)).sort_indices()
    r, c = coo.rows_np(), coo.cols_np()
    assert (np.lexsort((c, r)) == np.arange(4)).all()
    ref = SparseCOO(row, col, data, (3, 3)).todense()
    np.testing.assert_allclose(np.asarray(coo.todense()), np.asarray(ref))


def test_astype(key):
    x = _rand_dense(key, (4, 4))
    coo = SparseCOO.fromdense(x)
    assert coo.astype(jnp.bfloat16).dtype == jnp.bfloat16
