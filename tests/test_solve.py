"""sparse_generic_solve tests: forward vs dense solve, IFT gradient parity
at the nnz mask, higher-order gradients through parameterised sparse
matrices, solver plumbing (mirrors reference tests/test_sparse_solve.py
archetypes for the generic solve)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import SparseCOO, sparse_generic_solve
from torchsparsegradutils_tpu.solvers import (
    BICGSTABSettings,
    LinearCGSettings,
    MINRESSettings,
    bicgstab,
    linear_cg,
)
from torchsparsegradutils_tpu.utils import make_spd_sparse, rand_sparse

from test_config import LAYOUTS


N = 20
CG_KW = dict(solve=linear_cg, transpose_solve=linear_cg,
             settings=LinearCGSettings(max_iter=400, rtol=1e-7,
                                       mean_residual=False))


@pytest.fixture(params=LAYOUTS)
def layout(request):
    return request.param


def _spd(key, layout, n=N):
    sp = make_spd_sparse(key, n, n + 2 * n)
    return sp if layout == "coo" else sp.tocsr()


def test_forward_default_minres(key, layout):
    A = _spd(key, layout)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N,))
    x = sparse_generic_solve(A, b,
                             settings=MINRESSettings(max_iter=400,
                                                     rtol=1e-7))
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-3)


def test_forward_cg_multirhs(key, layout):
    A = _spd(key, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (N, 4))
    x = sparse_generic_solve(A, B, **CG_KW)
    ref = jnp.linalg.solve(A.todense(), B)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-3)


def test_grad_parity_vs_dense(key, layout):
    A = _spd(key, layout)
    kB, kG = jax.random.split(jax.random.fold_in(key, 1))
    B = jax.random.normal(kB, (N, 3))
    G = jax.random.normal(kG, (N, 3))
    rows, cols = A.tocoo().rows_np(), A.tocoo().cols_np()

    def loss_sparse(d, B):
        return (sparse_generic_solve(A.with_data(d), B, **CG_KW) * G).sum()

    def loss_dense(Ad, B):
        return (jnp.linalg.solve(Ad, B) * G).sum()

    gA_s, gB_s = jax.grad(loss_sparse, argnums=(0, 1))(A.data, B)
    gA_d, gB_d = jax.grad(loss_dense, argnums=(0, 1))(A.todense(), B)
    mask_grad = np.asarray(gA_d)[A.tocoo().rows_np() if layout == "coo"
                                 else rows, cols]
    np.testing.assert_allclose(np.asarray(gA_s), mask_grad, rtol=1e-2,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gB_s), np.asarray(gB_d),
                               rtol=1e-2, atol=1e-3)


def test_grad_container_cotangent(key, layout):
    A = _spd(key, layout)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N,))
    gA = jax.grad(lambda sp: sparse_generic_solve(sp, b, **CG_KW).sum())(A)
    assert type(gA) is type(A)
    assert gA.data.shape == A.data.shape


def test_vector_rhs_shape(key, layout):
    A = _spd(key, layout)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N,))
    x = sparse_generic_solve(A, b, **CG_KW)
    assert x.shape == (N,)


def test_nonsymmetric_bicgstab(key, layout):
    """Non-symmetric system with explicit transpose solver (reference
    test_sparse_solve.py:114-121)."""
    A = rand_sparse(key, (N, N), N * 4, well_conditioned=True,
                    layout=layout)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N,))
    st = BICGSTABSettings(max_iter=800, rtol=1e-8)

    def solve(M, rhs, **kw):
        return bicgstab(M, rhs, **kw)

    def transpose_solve(M, rhs, **kw):
        return bicgstab(M.T, rhs, **kw)

    def loss(d):
        return (sparse_generic_solve(A.with_data(d), b, solve=solve,
                                     transpose_solve=transpose_solve,
                                     settings=st) ** 2).sum()

    x = sparse_generic_solve(A, b, solve=solve, settings=st,
                             transpose_solve=transpose_solve)
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-2)
    g = jax.grad(loss)(A.data)
    rows, cols = A.tocoo().rows_np(), A.tocoo().cols_np()

    def loss_dense(vals):
        Ad = jnp.zeros((N, N)).at[rows, cols].add(vals)
        return (jnp.linalg.solve(Ad, b) ** 2).sum()

    gd = jax.grad(loss_dense)(A.data)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), rtol=5e-2,
                               atol=5e-3)


def test_higher_order_grads(key, layout):
    """theta -> tridiagonal SPD matrix -> solve; gradient and
    Hessian-vector-product match the dense path (reference
    test_sparse_solve.py:391-484)."""
    n = 8
    # tridiagonal SPD: diag = 2 + theta^2 (param), off-diag = -1
    main = np.arange(n)
    rows = np.concatenate([main, main[:-1], main[1:]])
    cols = np.concatenate([main, main[1:], main[:-1]])
    off = -jnp.ones(n - 1)

    def build_data(theta):
        return jnp.concatenate([2.0 + theta ** 2, off, off])

    pattern = SparseCOO(rows, cols, jnp.zeros(len(rows)), (n, n))
    pattern = pattern if layout == "coo" else pattern.tocsr()
    perm = None
    if layout == "csr":
        from torchsparsegradutils_tpu.utils import coo_to_csr_indices_values
        _, _, perm = coo_to_csr_indices_values(
            SparseCOO(rows, cols, jnp.zeros(len(rows)), (n, n)))
    b = jax.random.normal(key, (n,))

    def loss_sparse(theta):
        d = build_data(theta)
        if perm is not None:
            d = d[jnp.asarray(perm)]
        return (sparse_generic_solve(pattern.with_data(d), b,
                                     **CG_KW) ** 2).sum()

    def loss_dense(theta):
        Ad = (jnp.diag(2.0 + theta ** 2) + jnp.diag(off, 1)
              + jnp.diag(off, -1))
        return (jnp.linalg.solve(Ad, b) ** 2).sum()

    theta = jnp.linspace(0.5, 1.5, n)
    g_s = jax.grad(loss_sparse)(theta)
    g_d = jax.grad(loss_dense)(theta)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=1e-2,
                               atol=1e-3)
    v = jnp.ones(n)
    hvp_s = jax.grad(lambda t: jax.grad(loss_sparse)(t) @ v)(theta)
    hvp_d = jax.grad(lambda t: jax.grad(loss_dense)(t) @ v)(theta)
    np.testing.assert_allclose(np.asarray(hvp_s), np.asarray(hvp_d),
                               rtol=5e-2, atol=5e-3)


def test_jit(key, layout):
    A = _spd(key, layout)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N,))
    f = jax.jit(lambda sp, b: sparse_generic_solve(sp, b, **CG_KW))
    np.testing.assert_allclose(np.asarray(f(A, b)),
                               np.asarray(jnp.linalg.solve(A.todense(), b)),
                               rtol=1e-3, atol=1e-3)


def test_validation(key, layout):
    A = _spd(key, layout)
    with pytest.raises(TypeError, match="must be SparseCOO"):
        sparse_generic_solve(jnp.eye(N), jnp.ones(N))
    with pytest.raises(ValueError, match="square"):
        sparse_generic_solve(rand_sparse(key, (4, 6), 5, layout=layout),
                             jnp.ones(4))
    with pytest.raises(ValueError, match="incompatible shapes"):
        sparse_generic_solve(A, jnp.ones(N + 1))
    with pytest.warns(UserWarning, match="different dtypes"):
        try:
            sparse_generic_solve(A, jnp.ones(N, jnp.bfloat16))
        except Exception:
            pass
