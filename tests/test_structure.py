"""Structure utils: coo<->csr, block_diag <-> split round-trips, eye, stack,
coalesce (mirrors reference tests/test_utils.py archetypes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import SparseCOO
from torchsparsegradutils_tpu.utils import (
    coalesce,
    coo_to_csr,
    csr_to_coo,
    sparse_block_diag,
    sparse_block_diag_split,
    sparse_eye,
    sparse_stack,
)
from torchsparsegradutils_tpu.utils.random_sparse import rand_sparse


def test_coo_csr_roundtrip(key):
    coo = rand_sparse(key, (8, 6), 17)
    csr = coo_to_csr(coo)
    back = csr_to_coo(csr)
    np.testing.assert_allclose(np.asarray(coo.todense()),
                               np.asarray(csr.todense()), atol=1e-7)
    np.testing.assert_allclose(np.asarray(back.todense()),
                               np.asarray(csr.todense()), atol=1e-7)


def test_coo_csr_traced_dynamic(key):
    st = rand_sparse(key, (6, 6), 10)
    dyn = SparseCOO(st.rows_np(), st.cols_np(), st.data, st.shape,
                    pattern_static=False)

    @jax.jit
    def f(sp):
        return coo_to_csr(sp).todense()

    np.testing.assert_allclose(np.asarray(f(dyn)),
                               np.asarray(st.todense()), atol=1e-6)


@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_block_diag_and_split(key, layout):
    ks = jax.random.split(key, 3)
    mats = [rand_sparse(k, (4 + i, 3 + i), 6 + i, layout=layout)
            for i, k in enumerate(ks)]
    bd = sparse_block_diag(*mats)
    assert bd.shape == (4 + 5 + 6, 3 + 4 + 5)
    dense = np.zeros(bd.shape, np.float32)
    r = c = 0
    for m in mats:
        dense[r:r + m.shape[0], c:c + m.shape[1]] = np.asarray(m.todense())
        r += m.shape[0]
        c += m.shape[1]
    np.testing.assert_allclose(np.asarray(bd.todense()), dense, atol=1e-7)
    parts = sparse_block_diag_split(bd, *[m.shape for m in mats])
    for p, m in zip(parts, mats):
        np.testing.assert_allclose(np.asarray(p.todense()),
                                   np.asarray(m.todense()), atol=1e-7)


def test_block_diag_from_batched(key):
    sp = rand_sparse(key, (3, 4, 4), 5)
    bd = sparse_block_diag(sp)
    assert bd.shape == (12, 12)
    d = np.asarray(sp.todense())
    expect = np.zeros((12, 12), np.float32)
    for i in range(3):
        expect[4 * i:4 * i + 4, 4 * i:4 * i + 4] = d[i]
    np.testing.assert_allclose(np.asarray(bd.todense()), expect, atol=1e-7)


@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_sparse_eye(layout):
    eye = sparse_eye((5, 5), layout=layout)
    np.testing.assert_allclose(np.asarray(eye.todense()), np.eye(5))
    beye = sparse_eye((2, 4, 4), layout=layout)
    np.testing.assert_allclose(np.asarray(beye.todense()),
                               np.stack([np.eye(4)] * 2))


@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_sparse_stack(key, layout):
    ks = jax.random.split(key, 3)
    # shared pattern across elements
    base = rand_sparse(ks[0], (5, 5), 8, layout=layout)
    mats = [base.with_data(jax.random.normal(k, (8,))) for k in ks]
    st = sparse_stack(mats)
    assert st.shape == (3, 5, 5)
    np.testing.assert_allclose(
        np.asarray(st.todense()),
        np.stack([np.asarray(m.todense()) for m in mats]), atol=1e-7)
    # distinct patterns also stack (indices keep a batch dim)
    mats2 = [rand_sparse(k, (5, 5), 8, layout=layout) for k in ks]
    st2 = sparse_stack(mats2)
    np.testing.assert_allclose(
        np.asarray(st2.todense()),
        np.stack([np.asarray(m.todense()) for m in mats2]), atol=1e-7)


def test_coalesce(key):
    row = np.array([0, 0, 1, 1, 0])
    col = np.array([1, 1, 2, 2, 0])
    data = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    coo = SparseCOO(row, col, data, (3, 3))
    co = coalesce(coo)
    assert co.nnz == 3
    np.testing.assert_allclose(np.asarray(co.todense()),
                               np.asarray(coo.todense()))


def test_csr_transpose_batched(key):
    sp = rand_sparse(key, (2, 4, 6), 7, layout="csr")
    t = sp.T
    assert t.shape == (2, 6, 4)
    np.testing.assert_allclose(np.asarray(t.todense()),
                               np.transpose(np.asarray(sp.todense()),
                                            (0, 2, 1)), atol=1e-7)
