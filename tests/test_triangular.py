"""sparse_triangular_solve tests: forward vs dense solve_triangular for all
flag combinations, gradient parity at the nnz mask, batched, jit, block vs
dense algorithm agreement (mirrors reference
tests/test_sparse_triangular_solve.py archetypes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import SparseCOO, sparse_triangular_solve
from torchsparsegradutils_tpu.utils import rand_sparse_tri

from test_config import LAYOUTS

N = 40


@pytest.fixture(params=LAYOUTS)
def layout(request):
    return request.param


def _tri(key, layout, upper, strict=False, n=N, batch=None):
    shape = (batch, n, n) if batch else (n, n)
    nnz = (3 * n) if strict else (n + 2 * n)
    return rand_sparse_tri(key, shape, nnz, upper=upper, strict=strict,
                           layout=layout)


def _dense_solve(A, B, upper, unit, transpose):
    Ad = A if isinstance(A, jnp.ndarray) else A.todense()
    tri = jnp.triu(Ad) if upper else jnp.tril(Ad)
    if unit:
        tri = tri - jnp.diag(jnp.diag(tri)) + jnp.eye(tri.shape[-1])
    if transpose:
        tri = tri.T
    return jnp.linalg.solve(tri, B)


@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("algorithm", ["block", "dense"])
def test_forward_vs_dense(key, layout, upper, transpose, algorithm):
    A = _tri(key, layout, upper)
    B = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    x = sparse_triangular_solve(A, B, upper=upper, transpose=transpose,
                                algorithm=algorithm)
    ref = _dense_solve(A, B, upper, False, transpose)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("transpose", [False, True])
def test_unitriangular(key, layout, upper, transpose):
    A = _tri(key, layout, upper, strict=True)
    # scale strictly-triangular values down so the unit system is stable
    A = A.with_data(A.data * (0.5 / N))
    B = jax.random.normal(jax.random.fold_in(key, 1), (N, 2))
    x = sparse_triangular_solve(A, B, upper=upper, unitriangular=True,
                                transpose=transpose)
    ref = _dense_solve(A, B, upper, True, transpose)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_unitriangular_explicit_diag_raises(key, layout):
    A = _tri(key, layout, upper=False)  # has diagonal
    with pytest.raises(ValueError, match="explicit diagonal"):
        sparse_triangular_solve(A, jnp.ones((N, 1)), upper=False,
                                unitriangular=True)


def test_vector_rhs(key, layout):
    A = _tri(key, layout, upper=False)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N,))
    x = sparse_triangular_solve(A, b, upper=False)
    assert x.shape == (N,)
    ref = _dense_solve(A, b, False, False, False)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("transpose", [False, True])
def test_grad_parity(key, layout, upper, transpose):
    A = _tri(key, layout, upper, n=24)
    kB, kG = jax.random.split(jax.random.fold_in(key, 1))
    B = jax.random.normal(kB, (24, 2))
    G = jax.random.normal(kG, (24, 2))
    coo = A.tocoo()
    rows, cols = coo.rows_np(), coo.cols_np()

    def loss_sparse(d, B):
        x = sparse_triangular_solve(A.with_data(d), B, upper=upper,
                                    transpose=transpose)
        return (x * G).sum()

    def loss_dense(vals, B):
        Ad = jnp.zeros((24, 24)).at[rows, cols].add(
            vals if layout == "coo" else _perm_back(A, vals))
        x = _dense_solve(Ad, B, upper, False, transpose)
        return (x * G).sum()

    def _perm_back(A, vals):
        return vals  # CSR data aligns with coo order after conversion below

    # use coo-ordered data for the dense reference
    dense_ref_vals = coo.data
    gA_s, gB_s = jax.grad(loss_sparse, argnums=(0, 1))(A.data, B)
    gA_d, gB_d = jax.grad(
        lambda vals, B: loss_dense(vals, B), argnums=(0, 1))(
            dense_ref_vals, B)
    # map sparse grad to coo order for comparison
    if layout == "csr":
        gA_s_coo = A.with_data(gA_s).tocoo().data
    else:
        gA_s_coo = gA_s
    np.testing.assert_allclose(np.asarray(gA_s_coo), np.asarray(gA_d),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gB_s), np.asarray(gB_d),
                               rtol=1e-2, atol=1e-4)


@pytest.mark.parametrize("shared", [False, True])
def test_batched(key, layout, shared):
    A = rand_sparse_tri(key, (3, 16, 16), 16 + 20, upper=False,
                        layout=layout, shared_pattern=shared)
    B = jax.random.normal(jax.random.fold_in(key, 1), (3, 16, 2))
    x = sparse_triangular_solve(A, B, upper=False)
    d = A.todense()
    for i in range(3):
        ref = _dense_solve(d[i], B[i], False, False, False)
        np.testing.assert_allclose(np.asarray(x[i]), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)


def test_batched_rhs_only(key, layout):
    A = _tri(key, layout, upper=False, n=16)
    B = jax.random.normal(jax.random.fold_in(key, 1), (4, 16, 2))
    x = sparse_triangular_solve(A, B, upper=False)
    assert x.shape == (4, 16, 2)
    ref = _dense_solve(A, B[0], False, False, False)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_jit_and_block_sizes(key, layout):
    A = _tri(key, layout, upper=False)
    B = jax.random.normal(jax.random.fold_in(key, 1), (N, 2))
    ref = _dense_solve(A, B, False, False, False)
    for bs in (8, 16, 64):
        f = jax.jit(lambda sp, b: sparse_triangular_solve(
            sp, b, upper=False, block_size=bs))
        np.testing.assert_allclose(np.asarray(f(A, B)), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


def test_second_order(key, layout):
    A = _tri(key, layout, upper=False, n=12)
    b = jax.random.normal(jax.random.fold_in(key, 1), (12,))
    coo = A.tocoo()
    rows, cols = coo.rows_np(), coo.cols_np()

    def loss(d):
        return (sparse_triangular_solve(A.with_data(d), b,
                                        upper=False) ** 2).sum()

    def loss_dense(d):
        if A.layout == "csr":
            Ad = jnp.zeros((12, 12)).at[A.rows_np(), A.cols_np()].add(d)
        else:
            Ad = jnp.zeros((12, 12)).at[rows, cols].add(d)
        return (jnp.linalg.solve(jnp.tril(Ad), b) ** 2).sum()

    h_s = jax.jacrev(jax.grad(loss))(A.data)
    h_d = jax.jacrev(jax.grad(loss_dense))(A.data)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_d), rtol=1e-2,
                               atol=1e-3)


def test_ignores_wrong_triangle(key, layout):
    """Entries on the wrong side of the diagonal are ignored, as with dense
    triangular solves."""
    full = rand_sparse(key := jax.random.PRNGKey(7), (12, 12), 40,
                       well_conditioned=True, layout=layout)
    b = jax.random.normal(jax.random.fold_in(key, 1), (12,))
    x = sparse_triangular_solve(full, b, upper=False)
    ref = _dense_solve(full, b, False, False, False)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


from torchsparsegradutils_tpu.utils import rand_sparse  # noqa: E402


def test_validation(key, layout):
    A = _tri(key, layout, upper=False)
    with pytest.raises(ValueError, match="square"):
        sparse_triangular_solve(rand_sparse(key, (4, 6), 5, layout=layout),
                                jnp.ones(4))
    with pytest.raises(ValueError, match="dtype mismatch"):
        sparse_triangular_solve(A, jnp.ones(N, jnp.bfloat16), upper=False)
    with pytest.raises(ValueError, match="incompatible shapes"):
        sparse_triangular_solve(A, jnp.ones(N + 1), upper=False)
    with pytest.raises(ValueError, match="unknown algorithm"):
        sparse_triangular_solve(A, jnp.ones(N), upper=False,
                                algorithm="bogus")


# ---------------------------------------------------------------------------
# level-scheduled wavefront algorithm (round 3): the wave gate needs n > 256
# ---------------------------------------------------------------------------

NW = 512


@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("transpose", [False, True])
def test_wave_forward_vs_dense(key, layout, upper, transpose):
    A = _tri(key, layout, upper, n=NW)
    B = jax.random.normal(jax.random.fold_in(key, 1), (NW, 3))
    x = sparse_triangular_solve(A, B, upper=upper, transpose=transpose,
                                algorithm="wave")
    ref = _dense_solve(A, B, upper, False, transpose)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_wave_unitriangular(key, layout):
    A = _tri(key, layout, upper=False, strict=True, n=NW)
    B = jax.random.normal(jax.random.fold_in(key, 1), (NW, 2))
    x = sparse_triangular_solve(A, B, upper=False, unitriangular=True,
                                algorithm="wave")
    ref = _dense_solve(A, B, False, True, False)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_wave_grad_parity(key, layout):
    A = _tri(key, layout, upper=False, n=NW)
    B = jax.random.normal(jax.random.fold_in(key, 1), (NW, 2))
    G = jax.random.normal(jax.random.fold_in(key, 2), (NW, 2))

    gd, gb = jax.grad(
        lambda d, b: (sparse_triangular_solve(
            A.with_data(d), b, upper=False, algorithm="wave") * G).sum(),
        argnums=(0, 1))(A.data, B)
    mask = np.zeros((NW, NW), np.float32)
    rows, cols = np.asarray(A.rows()), np.asarray(A.cols())
    mask[rows, cols] = 1.0

    def dense_loss(vals, b):
        M = jnp.zeros((NW, NW)).at[rows, cols].set(vals)
        return (jnp.linalg.solve(M, b) * G).sum()

    rd, rb = jax.grad(dense_loss, argnums=(0, 1))(A.data, B)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-3,
                               atol=1e-3)


def test_wave_overflow_tier_engages(key, layout):
    """Degree-skewed factor: heavy rows spill into the overflow tier; the
    result must still match the blocked algorithm."""
    import numpy as onp
    rng = onp.random.default_rng(7)
    n = 2048
    rows = [onp.arange(n)]
    cols = [onp.arange(n)]
    # ~4 random strictly-lower entries per row, plus 60 heavy rows with
    # ~160 entries each (p99 base width forces the spill path)
    for r in range(1, n):
        k = 160 if (r % 34 == 0) else rng.integers(1, 5)
        c = rng.choice(r, size=min(int(k), r), replace=False)
        rows.append(onp.full(len(c), r))
        cols.append(c)
    rows = onp.concatenate(rows)
    cols = onp.concatenate(cols)
    order = onp.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.normal(size=len(rows)).astype(onp.float32)
    vals[cols == rows] = 3.0 + onp.abs(vals[cols == rows])  # well-cond diag
    A = SparseCOO(rows.astype(onp.int32), cols.astype(onp.int32),
                  jnp.asarray(vals), (n, n))
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    xw = sparse_triangular_solve(A, B, upper=False, algorithm="wave")
    xb = sparse_triangular_solve(A, B, upper=False, algorithm="block")
    np.testing.assert_allclose(np.asarray(xw), np.asarray(xb), rtol=1e-3,
                               atol=1e-4)
