"""Generator property tests.

Mirror of the reference's ``tests/test_random.py`` (922 LoC of
size/nnz/dtype/device cross products over every generator): shape and
exact-nnz invariants, capacity and validation errors, value/index dtype
propagation, triangularity (strict and non-strict), well-conditioning
(square/non-square/batched), SPD construction (symmetry, positive
definiteness, solvability, size/dtype sweeps), determinism — plus the
TPU-specific generators (``stencil_sparse``, ``hybrid_sparse``,
``make_spd_stencil``) that stand in for the reference's SuiteSparse
download in a zero-egress environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import dia_coverage
from torchsparsegradutils_tpu.utils import (
    make_spd_sparse,
    rand_sparse,
    rand_sparse_tri,
)
from torchsparsegradutils_tpu.utils.random_sparse import (
    hybrid_sparse,
    make_spd_stencil,
    stencil_sparse,
)

LAYOUTS = ["coo", "csr"]
VALUE_DTYPES = [jnp.float32, jnp.bfloat16]
INDEX_DTYPES = [jnp.int32, jnp.int64]


# ---------------------------------------------------------------- rand_sparse

@pytest.mark.parametrize("shape,nnz", [((4, 4), 1), ((4, 4), 16),
                                       ((10, 8), 20), ((8, 10), 20),
                                       ((1, 30), 12), ((30, 1), 12),
                                       ((64, 64), 500)])
@pytest.mark.parametrize("layout", LAYOUTS)
def test_rand_sparse_size_nnz(key, shape, nnz, layout):
    """Reference test_gen_random_coo_size_nnz / csr_size: exact shape and
    exact distinct-nnz across a size x nnz grid."""
    sp = rand_sparse(key, shape, nnz, layout=layout)
    assert sp.shape == shape
    assert sp.nnz == nnz
    assert sp.layout == layout
    d = np.asarray(sp.todense())
    assert (d != 0).sum() == nnz  # distinct positions, no collisions


@pytest.mark.parametrize("layout", LAYOUTS)
def test_rand_sparse_too_many_nnz(key, layout):
    """Reference test_gen_random_csr_too_many_nnz."""
    with pytest.raises(ValueError, match="exceeds capacity"):
        rand_sparse(key, (3, 3), 10, layout=layout)


@pytest.mark.parametrize("vdt", VALUE_DTYPES)
@pytest.mark.parametrize("layout", LAYOUTS)
def test_rand_sparse_values_dtype(key, vdt, layout):
    """Reference test_gen_random_*_values_dtype."""
    sp = rand_sparse(key, (8, 8), 12, layout=layout, value_dtype=vdt)
    assert sp.data.dtype == vdt
    assert sp.todense().dtype == vdt


@pytest.mark.parametrize("idt", INDEX_DTYPES)
@pytest.mark.parametrize("layout", LAYOUTS)
def test_rand_sparse_index_dtype(key, idt, layout):
    """Reference test_gen_random_*_indices_dtype_behavior: the requested
    index dtype is used verbatim (no silent upcast — the reference README
    documents torch COO's silent int64 upcast as a wart)."""
    sp = rand_sparse(key, (8, 8), 12, layout=layout, index_dtype=idt)
    assert sp.index_dtype() == np.dtype(idt)
    assert sp.tocoo().index_dtype() == np.dtype(idt)


@pytest.mark.parametrize("layout", LAYOUTS)
def test_rand_sparse_invalid_index_dtype(key, layout):
    """Reference test_gen_random_*_invalid_indices: non-integer index
    dtypes are rejected at container construction."""
    with pytest.raises((ValueError, TypeError)):
        rand_sparse(key, (8, 8), 12, layout=layout,
                    index_dtype=jnp.float32)


def test_rand_sparse_invalid_layout(key):
    with pytest.raises(ValueError, match="layout"):
        rand_sparse(key, (8, 8), 12, layout="bsr")


def test_rand_sparse_deterministic(key):
    a = rand_sparse(key, (10, 10), 15)
    b = rand_sparse(key, (10, 10), 15)
    assert (a.rows_np() == b.rows_np()).all()
    assert (a.cols_np() == b.cols_np()).all()
    np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data))
    c = rand_sparse(jax.random.fold_in(key, 1), (10, 10), 15)
    assert not ((a.rows_np() == c.rows_np()).all()
                and (a.cols_np() == c.cols_np()).all())


def test_rand_sparse_csr_canonical_order(key):
    """CSR output is row-major sorted — the canonical order the Pallas
    chunk planner requires (CLAUDE.md invariants)."""
    sp = rand_sparse(key, (20, 20), 80, layout="csr")
    coo = sp.tocoo()
    r, c = coo.rows_np(), coo.cols_np()
    keys = r.astype(np.int64) * 20 + c
    assert (np.diff(keys) > 0).all()


# --------------------------------------------------------- well_conditioned

def test_rand_sparse_well_conditioned_square(key):
    sp = rand_sparse(key, (12, 12), 40, well_conditioned=True)
    d = np.asarray(sp.todense())
    for i in range(12):
        assert abs(d[i, i]) > np.abs(d[i]).sum() - abs(d[i, i]) - 1e-5
    # comfortably invertible
    assert np.isfinite(np.linalg.cond(d))
    assert np.linalg.cond(d) < 1e3


def test_rand_sparse_well_conditioned_non_square_raises(key):
    """Reference test_rand_sparse_well_conditioned_non_square."""
    with pytest.raises(ValueError, match="square"):
        rand_sparse(key, (10, 8), 20, well_conditioned=True)


def test_rand_sparse_well_conditioned_nnz_floor(key):
    with pytest.raises(ValueError, match="nnz >= n"):
        rand_sparse(key, (5, 5), 3, well_conditioned=True)


def test_rand_sparse_default_not_conditioned(key):
    """Reference test_rand_sparse_well_conditioned_default_behavior: the
    default draw does NOT force the diagonal."""
    sp = rand_sparse(key, (30, 30), 40)
    d = np.asarray(sp.todense())
    assert (np.diag(d) == 0).any()


def test_rand_sparse_batched_well_conditioned(key):
    """Reference test_rand_sparse_batched_well_conditioned: every batch
    element is diagonally dominant (both pattern modes)."""
    for shared in (False, True):
        sp = rand_sparse(key, (3, 10, 10), 24, well_conditioned=True,
                         shared_pattern=shared)
        d = np.asarray(sp.todense())
        for b in range(3):
            off = np.abs(d[b]).sum(1) - np.abs(np.diag(d[b]))
            assert (np.abs(np.diag(d[b])) > off - 1e-5).all()


# ------------------------------------------------------------ rand_sparse_tri

@pytest.mark.parametrize("size", [(6, 6), (9, 6), (6, 9)])
@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("layout", LAYOUTS)
def test_tri_strict_properties(key, size, upper, layout):
    """Reference test_gen_random_strict_tri_*_properties across square,
    tall, and wide shapes: strictly one-sided, zero diagonal, exact nnz."""
    n, m = size
    nnz = min(n, m)
    sp = rand_sparse_tri(key, size, nnz, upper=upper, strict=True,
                         layout=layout)
    d = np.asarray(sp.todense())
    assert sp.nnz == nnz and (d != 0).sum() == nnz
    if upper:
        assert np.allclose(np.tril(d), 0)
    else:
        assert np.allclose(np.triu(d), 0)


@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("layout", LAYOUTS)
def test_tri_nonstrict_full_diagonal(key, upper, layout):
    """Reference test_rand_sparse_tri_nonstrict_diag: non-strict triangles
    always carry the full diagonal (reference :867-934)."""
    sp = rand_sparse_tri(key, (9, 9), 17, upper=upper, layout=layout)
    d = np.asarray(sp.todense())
    assert (np.diag(d) != 0).all()
    if upper:
        assert np.allclose(np.tril(d, -1), 0)
    else:
        assert np.allclose(np.triu(d, 1), 0)


def test_tri_strict_too_many_nnz(key):
    """Reference test_gen_random_strict_tri_*_too_many_nnz."""
    with pytest.raises(ValueError, match="exceeds capacity"):
        rand_sparse_tri(key, (4, 4), 7, strict=True)  # cap = 6


def test_tri_nonstrict_nnz_floor(key):
    with pytest.raises(ValueError, match="diagonal length"):
        rand_sparse_tri(key, (6, 6), 4)


@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("layout", LAYOUTS)
def test_tri_well_conditioned_solvable(key, upper, strict, layout):
    """Reference test_rand_sparse_tri_well_conditioned: the default
    (well-conditioned, non-strict) factor solves stably."""
    nnz = 8 if strict else 17
    sp = rand_sparse_tri(key, (9, 9), nnz, upper=upper, strict=strict,
                         layout=layout)
    d = np.asarray(sp.todense())
    if strict:
        assert np.allclose(np.diag(d), 0)
    else:
        off = np.abs(d).sum(1) - np.abs(np.diag(d))
        assert (np.abs(np.diag(d)) > off - 1e-5).all()
        x = np.linalg.solve(d, np.ones(9, np.float32))
        assert np.isfinite(x).all()


@pytest.mark.parametrize("vdt", VALUE_DTYPES)
@pytest.mark.parametrize("idt", INDEX_DTYPES)
def test_tri_dtypes(key, vdt, idt):
    """Reference test_gen_random_strict_tri_*_values/indices_dtype."""
    sp = rand_sparse_tri(key, (8, 8), 15, value_dtype=vdt, index_dtype=idt)
    assert sp.data.dtype == vdt
    assert sp.index_dtype() == np.dtype(idt)


def test_tri_batched(key):
    sp = rand_sparse_tri(key, (4, 7, 7), 13)
    d = np.asarray(sp.todense())
    assert d.shape == (4, 7, 7)
    for b in range(4):
        assert np.allclose(np.triu(d[b], 1), 0)
        assert (np.diag(d[b]) != 0).all()


# -------------------------------------------------------------- rand batched

def test_rand_sparse_batched(key):
    sp = rand_sparse(key, (4, 6, 6), 9)
    assert sp.shape == (4, 6, 6)
    d = np.asarray(sp.todense())
    assert d.shape == (4, 6, 6)
    # per-element patterns differ
    assert not np.array_equal(sp.rows_np()[0], sp.rows_np()[1])
    shared = rand_sparse(key, (4, 6, 6), 9, shared_pattern=True)
    assert shared.rows_np().ndim == 1
    # shared pattern, distinct values
    dv = np.asarray(shared.data)
    assert not np.array_equal(dv[0], dv[1])


def test_rand_sparse_batched_multi_dim(key):
    sp = rand_sparse(key, (2, 3, 5, 5), 7, layout="csr")
    assert sp.shape == (2, 3, 5, 5)
    assert np.asarray(sp.todense()).shape == (2, 3, 5, 5)


# ------------------------------------------------------------ make_spd_sparse

@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("vdt", VALUE_DTYPES)
@pytest.mark.parametrize("idt", INDEX_DTYPES)
def test_spd_basic(key, layout, vdt, idt):
    """Reference test_make_spd_sparse_basic / value_dtype / index_dtype /
    mixed_dtypes: dtype propagation across the layout x dtype product."""
    sp = make_spd_sparse(key, 12, 12 + 2 * 8, layout=layout,
                         value_dtype=vdt, index_dtype=idt)
    assert sp.layout == layout
    assert sp.data.dtype == vdt
    assert sp.index_dtype() == np.dtype(idt)
    assert sp.nnz == 12 + 2 * 8
    d = np.asarray(sp.todense().astype(jnp.float32))
    np.testing.assert_allclose(d, d.T, atol=1e-2 if vdt == jnp.bfloat16
                               else 1e-6)


@pytest.mark.parametrize("n", [4, 16, 64, 256])
def test_spd_positive_definite_sizes(key, n):
    """Reference test_make_spd_sparse_positive_definite /
    different_sizes: smallest eigenvalue strictly positive at every n."""
    sp = make_spd_sparse(key, n, n + 2 * (n // 2))
    w = np.linalg.eigvalsh(np.asarray(sp.todense()))
    assert w.min() > 0


def test_spd_solve_system(key):
    """Reference test_make_spd_sparse_solve_system: the operator is
    usable by a direct solve and the residual is small."""
    sp = make_spd_sparse(key, 24, 24 + 2 * 30)
    d = np.asarray(sp.todense())
    b = np.asarray(jax.random.normal(jax.random.fold_in(key, 1), (24,)))
    x = np.linalg.solve(d, b)
    np.testing.assert_allclose(d @ x, b, rtol=1e-4, atol=1e-5)


def test_spd_nz_parameter(key):
    """Reference test_make_spd_sparse_nz_parameter: nnz counts total
    stored entries; diagonal is always complete."""
    for nnz in (16, 16 + 2 * 5, 16 + 2 * 40):
        sp = make_spd_sparse(key, 16, nnz)
        assert sp.nnz == nnz
        assert (np.diag(np.asarray(sp.todense())) != 0).all()


def test_spd_validation_errors(key):
    """Reference test_make_spd_sparse_invalid_layout + parity checks."""
    with pytest.raises(ValueError, match="even"):
        make_spd_sparse(key, 4, 7)
    with pytest.raises(ValueError, match="nnz >= n"):
        make_spd_sparse(key, 8, 6)
    with pytest.raises(ValueError, match="layout"):
        make_spd_sparse(key, 8, 12, layout="ell")


def test_spd_pattern_symmetric(key):
    """Reference test_make_spd_sparse_sparsity_patterns: the *pattern*
    itself is symmetric (every (i,j) has its (j,i) mirror)."""
    sp = make_spd_sparse(key, 20, 20 + 2 * 25)
    coo = sp.tocoo() if sp.layout == "csr" else sp
    pairs = set(zip(coo.rows_np().tolist(), coo.cols_np().tolist()))
    assert all((j, i) in pairs for i, j in pairs)


# ------------------------------------------------------------- stencil_sparse

def test_stencil_full_pattern(key):
    offs = [0, 1, -1, 5, -5]
    sp = stencil_sparse(key, (20, 20), offs)
    coo = sp.tocoo()
    got_offs = np.unique(coo.cols_np().astype(np.int64)
                         - coo.rows_np().astype(np.int64))
    assert set(got_offs.tolist()) == set(offs)
    # every diagonal is fully populated up to boundary truncation
    assert sp.nnz == sum(20 - abs(d) for d in offs)
    cov = dia_coverage(sp)
    assert cov["coverage"] == 1.0


def test_stencil_nnz_thinning(key):
    sp = stencil_sparse(key, (20, 20), [0, 1, -1], nnz=30)
    assert sp.nnz == 30


def test_stencil_errors(key):
    with pytest.raises(ValueError, match="bounds"):
        stencil_sparse(key, (8, 8), [0, 9])
    with pytest.raises(ValueError, match="non-empty"):
        stencil_sparse(key, (8, 8), [])
    with pytest.raises(ValueError, match="offset 0"):
        stencil_sparse(key, (8, 8), [1, -1], well_conditioned=True)
    with pytest.raises(ValueError, match="nnz"):
        stencil_sparse(key, (8, 8), [0], nnz=100)


def test_stencil_well_conditioned(key):
    sp = stencil_sparse(key, (16, 16), [0, 1, -1, 4, -4],
                        well_conditioned=True)
    d = np.asarray(sp.todense())
    off = np.abs(d).sum(1) - np.abs(np.diag(d))
    assert (np.abs(np.diag(d)) > off - 1e-5).all()


def test_stencil_rectangular(key):
    sp = stencil_sparse(key, (12, 20), [0, 3, -2])
    assert sp.shape == (12, 20)
    coo = sp.tocoo()
    assert (coo.rows_np() < 12).all() and (coo.cols_np() < 20).all()


# -------------------------------------------------------------- hybrid_sparse

@pytest.mark.parametrize("cov", [0.7, 0.85, 0.95, 1.0])
def test_hybrid_coverage_achieved(key, cov):
    offs = [0, 1, -1, 8, -8]
    sp = hybrid_sparse(key, (64, 64), offs, 300, dia_coverage=cov)
    assert sp.nnz == 300
    got = dia_coverage(sp)["coverage"]
    # residual entries may land on unkept diagonals; allow slack upward
    assert got >= cov - 0.02


def test_hybrid_residual_off_stencil(key):
    offs = [0, 1, -1]
    sp = hybrid_sparse(key, (40, 40), offs, 200, dia_coverage=0.5)
    coo = sp.tocoo()
    d = coo.cols_np().astype(np.int64) - coo.rows_np().astype(np.int64)
    n_on = int(np.isin(d, offs).sum())
    # round(nnz * cov) structured entries, plus the odd residual draw
    # that lands on a thinned-away stencil position (documented slack)
    assert 100 <= n_on <= 110


def test_hybrid_validation(key):
    with pytest.raises(ValueError, match="dia_coverage"):
        hybrid_sparse(key, (8, 8), [0], 10, dia_coverage=0.0)
    with pytest.raises(ValueError, match="dia_coverage"):
        hybrid_sparse(key, (8, 8), [0], 10, dia_coverage=1.5)


def test_hybrid_deterministic(key):
    a = hybrid_sparse(key, (30, 30), [0, 2, -2], 100, dia_coverage=0.8)
    b = hybrid_sparse(key, (30, 30), [0, 2, -2], 100, dia_coverage=0.8)
    assert (a.tocoo().rows_np() == b.tocoo().rows_np()).all()
    np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data))


def test_hybrid_stencil_capacity_clamp(key):
    """Requesting more structured entries than the stencil holds clamps
    to capacity and pushes the remainder to the residual."""
    offs = [0]  # capacity 16
    sp = hybrid_sparse(key, (16, 16), offs, 50, dia_coverage=0.9)
    assert sp.nnz == 50
    coo = sp.tocoo()
    on_diag = (coo.rows_np() == coo.cols_np()).sum()
    assert on_diag == 16


# ------------------------------------------------------------ make_spd_stencil

def test_spd_stencil_properties(key):
    sp = make_spd_stencil(key, 32, [1, 4])
    d = np.asarray(sp.todense())
    np.testing.assert_allclose(d, d.T, atol=1e-6)
    assert np.linalg.eigvalsh(d).min() > 0
    cov = dia_coverage(sp)
    assert cov["coverage"] == 1.0


def test_spd_stencil_nnz_thinning(key):
    full = make_spd_stencil(key, 24, [1, 3, 7])
    thin = make_spd_stencil(key, 24, [1, 3, 7], nnz=24 + 2 * 10)
    assert thin.nnz < full.nnz
    d = np.asarray(thin.todense())
    np.testing.assert_allclose(d, d.T, atol=1e-6)
    assert np.linalg.eigvalsh(d).min() > 0
