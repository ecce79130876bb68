"""Generator property tests (mirrors reference tests/test_random.py):
shape/nnz/dtype/triangularity/SPD invariants, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu.utils import (
    make_spd_sparse,
    rand_sparse,
    rand_sparse_tri,
)


@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_rand_sparse_basic(key, layout):
    sp = rand_sparse(key, (10, 8), 20, layout=layout)
    assert sp.shape == (10, 8)
    assert sp.nnz == 20
    d = np.asarray(sp.todense())
    assert (d != 0).sum() == 20  # distinct positions, no collisions
    assert sp.layout == layout


def test_rand_sparse_deterministic(key):
    a = rand_sparse(key, (10, 10), 15)
    b = rand_sparse(key, (10, 10), 15)
    assert (a.rows_np() == b.rows_np()).all()
    np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data))


def test_rand_sparse_well_conditioned(key):
    sp = rand_sparse(key, (12, 12), 40, well_conditioned=True)
    d = np.asarray(sp.todense())
    # strictly diagonally dominant -> invertible
    for i in range(12):
        assert abs(d[i, i]) > np.abs(d[i]).sum() - abs(d[i, i]) - 1e-5


@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_rand_sparse_tri(key, upper, strict, layout):
    sp = rand_sparse_tri(key, (9, 9), 9 + 8 if not strict else 8,
                         upper=upper, strict=strict, layout=layout)
    d = np.asarray(sp.todense())
    if upper:
        assert np.allclose(np.tril(d, -1), 0)
    else:
        assert np.allclose(np.triu(d, 1), 0)
    if strict:
        assert np.allclose(np.diag(d), 0)
    else:
        assert (np.diag(d) != 0).all()


def test_rand_sparse_batched(key):
    sp = rand_sparse(key, (4, 6, 6), 9)
    assert sp.shape == (4, 6, 6)
    d = np.asarray(sp.todense())
    assert d.shape == (4, 6, 6)
    # per-element patterns differ
    assert not np.array_equal(sp.rows_np()[0], sp.rows_np()[1])
    shared = rand_sparse(key, (4, 6, 6), 9, shared_pattern=True)
    assert shared.rows_np().ndim == 1


def test_make_spd_sparse(key):
    sp = make_spd_sparse(key, 16, 16 + 2 * 12)
    d = np.asarray(sp.todense())
    np.testing.assert_allclose(d, d.T, atol=1e-6)
    w = np.linalg.eigvalsh(d)
    assert w.min() > 0


def test_nnz_capacity_errors(key):
    with pytest.raises(ValueError, match="exceeds capacity"):
        rand_sparse(key, (3, 3), 10)
    with pytest.raises(ValueError, match="nnz >= n"):
        rand_sparse(key, (5, 5), 3, well_conditioned=True)
    with pytest.raises(ValueError, match="even"):
        make_spd_sparse(key, 4, 7)
