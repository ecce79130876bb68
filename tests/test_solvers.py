"""Krylov solver tests: convergence vs dense solve on SPD/nonsymmetric/
indefinite/least-squares systems, multi-RHS, shifts, damping, closures,
jit (mirrors the solver usage in reference tests/test_sparse_solve.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu.solvers import (
    BICGSTABSettings,
    LinearCGSettings,
    LSMRSettings,
    MINRESSettings,
    bicgstab,
    linear_cg,
    lsmr,
    minres,
)
from torchsparsegradutils_tpu.utils import make_spd_sparse, rand_sparse


def _spd(key, n=24, nnz=None):
    nnz = nnz or (n + 2 * n)
    return make_spd_sparse(key, n, nnz)


def test_cg_spd_vector(key):
    A = _spd(key)
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    x = linear_cg(A, b, settings=LinearCGSettings(max_iter=200, rtol=1e-6))
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_cg_multirhs(key):
    A = _spd(key)
    B = jax.random.normal(jax.random.fold_in(key, 1), (24, 5))
    x = linear_cg(A, B, settings=LinearCGSettings(max_iter=200, rtol=1e-6))
    ref = jnp.linalg.solve(A.todense(), B)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_cg_preconditioner(key):
    A = _spd(key)
    d = jnp.diag(A.todense())
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    x = linear_cg(A, b, preconditioner=lambda r: r / d[:, None]
                  if r.ndim == 2 else r / d,
                  settings=LinearCGSettings(max_iter=200, rtol=1e-6))
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_cg_closure_and_dense(key):
    A = _spd(key)
    Ad = A.todense()
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    x1 = linear_cg(Ad, b, settings=LinearCGSettings(rtol=1e-6))
    x2 = linear_cg(lambda v: Ad @ v, b, settings=LinearCGSettings(rtol=1e-6))
    ref = jnp.linalg.solve(Ad, b)
    for x in (x1, x2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


def test_cg_zero_rhs(key):
    A = _spd(key)
    b = jnp.zeros((24,))
    x = linear_cg(A, b)
    np.testing.assert_allclose(np.asarray(x), 0.0)


def test_cg_jit(key):
    A = _spd(key)
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    f = jax.jit(lambda sp, b: linear_cg(
        sp, b, settings=LinearCGSettings(max_iter=200, rtol=1e-6)))
    x = f(A, b)
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_cg_tridiag_logdet(key):
    """Lanczos T matrices from CG estimate eigen-structure: for a small SPD
    matrix run to convergence, eig(T) ~ subset of eig(A) and the Gaussian
    quadrature logdet estimate is finite and close-ish."""
    A = _spd(key, n=16, nnz=16 + 2 * 8)
    k = 4
    probes = jax.random.rademacher(jax.random.fold_in(key, 3), (16, k),
                                   dtype=jnp.float32)
    x, (t_diag, t_off, iters) = linear_cg(
        A, probes, settings=LinearCGSettings(max_iter=64, rtol=1e-8,
                                             mean_residual=False),
        n_tridiag=k)
    iters = int(iters)
    assert iters > 1
    # build T matrices and compare stochastic logdet estimate to truth
    n = 16
    logdet_est = 0.0
    for j in range(k):
        d = np.asarray(t_diag[:iters, j])
        e = np.asarray(t_off[:iters - 1, j])
        T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
        w, V = np.linalg.eigh(T)
        w = np.maximum(w, 1e-12)
        logdet_est += n * float(V[0] ** 2 @ np.log(w)) / k
    truth = float(np.linalg.slogdet(np.asarray(A.todense()))[1])
    assert abs(logdet_est - truth) / abs(truth) < 0.5


def test_bicgstab_nonsymmetric(key):
    A = rand_sparse(key, (24, 24), 24 * 4, well_conditioned=True)
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    x = bicgstab(A, b, settings=BICGSTABSettings(max_iter=400, rtol=1e-7))
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)


def test_bicgstab_multirhs(key):
    A = rand_sparse(key, (20, 20), 20 * 3, well_conditioned=True)
    B = jax.random.normal(jax.random.fold_in(key, 1), (20, 3))
    x = bicgstab(A, B, settings=BICGSTABSettings(max_iter=400, rtol=1e-7))
    ref = jnp.linalg.solve(A.todense(), B)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)


def test_minres_spd(key):
    A = _spd(key)
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    x = minres(A, b, settings=MINRESSettings(max_iter=300, rtol=1e-7))
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-3)


def test_minres_indefinite(key):
    """MINRES handles symmetric indefinite systems (CG would fail)."""
    A = _spd(key)
    Ad = A.todense() - 2.5 * jnp.eye(24)  # make indefinite, symmetric
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    x = minres(Ad, b, settings=MINRESSettings(max_iter=500, rtol=1e-7))
    ref = jnp.linalg.solve(Ad, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-2)


def test_minres_multirhs_and_shifts(key):
    A = _spd(key)
    B = jax.random.normal(jax.random.fold_in(key, 1), (24, 3))
    shifts = jnp.array([0.0, 0.5, 1.0])
    x = minres(A, B, shifts=shifts,
               settings=MINRESSettings(max_iter=500, rtol=1e-7))
    assert x.shape == (3, 24, 3)
    for i, sg in enumerate(np.asarray(shifts)):
        ref = jnp.linalg.solve(A.todense() + sg * jnp.eye(24), B)
        np.testing.assert_allclose(np.asarray(x[i]), np.asarray(ref),
                                   rtol=1e-2, atol=1e-2)


def test_lsmr_square(key):
    A = rand_sparse(key, (20, 20), 20 * 3, well_conditioned=True)
    b = jax.random.normal(jax.random.fold_in(key, 1), (20,))
    x, itn = lsmr(A, b, settings=LSMRSettings(max_iter=400, atol=1e-8,
                                              btol=1e-8))
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)
    assert int(itn) > 0


def test_lsmr_overdetermined(key):
    A = rand_sparse(key, (30, 10), 80)
    b = jax.random.normal(jax.random.fold_in(key, 1), (30,))
    x, _ = lsmr(A, b, settings=LSMRSettings(max_iter=400, atol=1e-10,
                                            btol=1e-10))
    ref, *_ = jnp.linalg.lstsq(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)


def test_lsmr_multirhs(key):
    A = rand_sparse(key, (30, 10), 80)
    B = jax.random.normal(jax.random.fold_in(key, 1), (30, 4))
    x, _ = lsmr(A, B, settings=LSMRSettings(max_iter=400, atol=1e-10,
                                            btol=1e-10))
    ref, *_ = jnp.linalg.lstsq(A.todense(), B)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)


def test_lsmr_damped(key):
    A = rand_sparse(key, (30, 10), 80)
    b = jax.random.normal(jax.random.fold_in(key, 1), (30,))
    damp = 0.7
    x, _ = lsmr(A, b, settings=LSMRSettings(max_iter=600, atol=1e-10,
                                            btol=1e-10, damp=damp))
    Ad = np.asarray(A.todense())
    ref = np.linalg.solve(Ad.T @ Ad + damp ** 2 * np.eye(10), Ad.T @ np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-2, atol=1e-3)


def test_lsmr_zero_rhs(key):
    A = rand_sparse(key, (12, 6), 20)
    x, itn = lsmr(A, jnp.zeros((12,)))
    np.testing.assert_allclose(np.asarray(x), 0.0)
    assert int(itn) == 0


def test_cg_x0_warm_start(key):
    A = _spd(key)
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    ref = jnp.linalg.solve(A.todense(), b)
    # warm start from near the solution converges fine
    x = linear_cg(A, b, x0=ref + 0.01,
                  settings=LinearCGSettings(max_iter=100, rtol=1e-7))
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_bicgstab_preconditioner(key):
    A = rand_sparse(key, (20, 20), 20 * 3, well_conditioned=True)
    d = jnp.diag(A.todense())
    b = jax.random.normal(jax.random.fold_in(key, 1), (20,))
    x = bicgstab(A, b, preconditioner=lambda v: v / d[:, None]
                 if v.ndim == 2 else v / d,
                 settings=BICGSTABSettings(max_iter=400, rtol=1e-8))
    ref = jnp.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)


def test_lsmr_callable_with_rmatvec(key):
    A = rand_sparse(key, (30, 10), 80)
    Ad = A.todense()
    b = jax.random.normal(jax.random.fold_in(key, 1), (30,))
    x, _ = lsmr(lambda v: Ad @ v, b, rmatvec=lambda v: Ad.T @ v,
                settings=LSMRSettings(max_iter=400, atol=1e-10,
                                      btol=1e-10))
    ref, *_ = jnp.linalg.lstsq(Ad, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-2,
                               atol=1e-3)


def test_lsmr_callable_requires_rmatvec(key):
    Ad = jnp.eye(4)
    with pytest.raises(ValueError, match="transpose closure"):
        lsmr(lambda v: Ad @ v, jnp.ones(4))


def test_minres_scalar_shift_matches_reference_convention(key):
    A = _spd(key)
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    x = minres(A, b, shifts=jnp.array([0.7]),
               settings=MINRESSettings(max_iter=500, rtol=1e-7))
    ref = jnp.linalg.solve(A.todense() + 0.7 * jnp.eye(24), b)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)


class TestLSMRComplex:
    """Complex dtype support (reference utils/lsmr.py:167-171)."""

    def test_complex_least_squares(self, key):
        from torchsparsegradutils_tpu.solvers import LSMRSettings, lsmr
        rng = np.random.default_rng(3)
        n, m = 90, 60
        Ar = (rng.normal(size=(n, m))
              + 1j * rng.normal(size=(n, m))).astype(np.complex64)
        b = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
            np.complex64)
        A = jnp.asarray(Ar)
        x, itn = lsmr(A, jnp.asarray(b),
                      rmatvec=lambda y: A.conj().T @ y,
                      settings=LSMRSettings(max_iter=400, atol=1e-7,
                                            btol=1e-7))
        xr = np.linalg.lstsq(Ar, b, rcond=None)[0]
        np.testing.assert_allclose(np.asarray(x), xr, rtol=2e-3, atol=2e-4)

    def test_complex_damped(self, key):
        from torchsparsegradutils_tpu.solvers import LSMRSettings, lsmr
        rng = np.random.default_rng(4)
        n, m = 50, 50
        Ar = (rng.normal(size=(n, m))
              + 1j * rng.normal(size=(n, m))).astype(np.complex64)
        b = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
            np.complex64)
        damp = 0.7
        A = jnp.asarray(Ar)
        x, _ = lsmr(A, jnp.asarray(b), rmatvec=lambda y: A.conj().T @ y,
                    settings=LSMRSettings(max_iter=500, atol=1e-8,
                                          btol=1e-8, damp=damp))
        # normal equations of the damped system
        xr = np.linalg.solve(Ar.conj().T @ Ar + damp**2 * np.eye(m),
                             Ar.conj().T @ b)
        np.testing.assert_allclose(np.asarray(x), xr, rtol=2e-3, atol=2e-4)


class TestSolveDiagnostics:
    """diagnostics=True returns (x, SolveInfo); eager non-convergence
    warns (reference parity: linear_cg.py:413-423, bicgstab.py:9-19)."""

    def test_cg_diagnostics_converged(self, key):
        from torchsparsegradutils_tpu.solvers import SolveInfo
        A = _spd(key)
        B = jax.random.normal(jax.random.fold_in(key, 1), (24, 3))
        x, info = linear_cg(
            A, B, settings=LinearCGSettings(max_iter=300, rtol=1e-6),
            diagnostics=True)
        assert isinstance(info, SolveInfo)
        assert bool(np.all(np.asarray(info.converged)))
        assert 0 < int(info.iterations) < 300
        assert info.residual.shape == (3,)
        r = np.linalg.norm(np.asarray(A.todense() @ x - B), axis=0)
        np.testing.assert_allclose(np.asarray(info.residual), r,
                                   rtol=1e-2, atol=1e-5)

    def test_cg_nonconvergence_warns_eager(self, key):
        A = _spd(key)
        b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
        with pytest.warns(UserWarning, match="did not converge"):
            _ = linear_cg(A, b, settings=LinearCGSettings(max_iter=2,
                                                          rtol=1e-12))

    def test_cg_nonconvergence_silent_under_jit(self, key):
        import warnings as _w
        A = _spd(key)
        b = jax.random.normal(jax.random.fold_in(key, 1), (24,))

        @jax.jit
        def solve(d, b):
            return linear_cg(A.with_data(d), b,
                             settings=LinearCGSettings(max_iter=2,
                                                       rtol=1e-12))
        with _w.catch_warnings():
            _w.simplefilter("error")
            jax.block_until_ready(solve(A.data, b))

    def test_bicgstab_diagnostics(self, key):
        A = rand_sparse(key, (30, 30), 120, layout="csr")
        A = A.with_data(A.data * 0.1)
        Ad = A.todense() + 3.0 * jnp.eye(30)
        b = jax.random.normal(jax.random.fold_in(key, 1), (30,))
        x, info = bicgstab(Ad, b,
                           settings=BICGSTABSettings(max_iter=200,
                                                     rtol=1e-6),
                           diagnostics=True)
        assert bool(np.all(np.asarray(info.converged)))
        assert info.residual.ndim == 0 or info.residual.shape == ()
        np.testing.assert_allclose(np.asarray(Ad @ x), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)

    def test_bicgstab_nonconvergence_warns(self, key):
        A = _spd(key)
        b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
        with pytest.warns(UserWarning, match="did not converge"):
            _ = bicgstab(A, b, settings=BICGSTABSettings(max_iter=1,
                                                         rtol=1e-12))

    def test_minres_diagnostics_shifted(self, key):
        A = _spd(key)
        B = jax.random.normal(jax.random.fold_in(key, 1), (24, 2))
        x, info = minres(A, B, shifts=jnp.array([0.0, 1.0]),
                         settings=MINRESSettings(max_iter=300, rtol=1e-6),
                         diagnostics=True)
        assert x.shape == (2, 24, 2)
        assert info.residual.shape == (2, 2)
        assert info.converged.shape == (2, 2)
        assert bool(np.all(np.asarray(info.converged)))

    def test_minres_nonconvergence_warns(self, key):
        A = _spd(key)
        b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
        with pytest.warns(UserWarning, match="did not converge"):
            _ = minres(A, b, settings=MINRESSettings(max_iter=1,
                                                     rtol=1e-14))


class TestSolverVerbose:
    """verbose=True prints per-iteration residuals via jax.debug.print
    (reference parity: linear_cg.py:275-277, minres.py:233-238, and the
    bicgstab logger hook, bicgstab.py:9-19)."""

    def test_cg_verbose_prints(self, key, capfd):
        A = _spd(key)
        b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
        _ = linear_cg(A, b, settings=LinearCGSettings(
            max_iter=50, rtol=1e-6, verbose=True))
        jax.effects_barrier()
        out = capfd.readouterr().out
        assert "linear_cg iter" in out and "residual" in out

    def test_bicgstab_verbose_prints(self, key, capfd):
        A = _spd(key)
        b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
        _ = bicgstab(A, b, settings=BICGSTABSettings(
            max_iter=50, rtol=1e-6, verbose=True))
        jax.effects_barrier()
        assert "bicgstab iter" in capfd.readouterr().out

    def test_minres_verbose_prints_under_jit(self, key, capfd):
        A = _spd(key)
        b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
        st = MINRESSettings(max_iter=50, rtol=1e-6, verbose=True)
        _ = jax.jit(lambda d, b: minres(A.with_data(d), b, settings=st))(
            A.data, b)
        jax.effects_barrier()
        assert "minres iter" in capfd.readouterr().out

    def test_verbose_off_is_silent(self, key, capfd):
        A = _spd(key)
        b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
        _ = linear_cg(A, b, settings=LinearCGSettings(max_iter=50))
        jax.effects_barrier()
        assert "iter" not in capfd.readouterr().out


def test_generic_solve_boundary_nonconvergence_warns(key):
    """The non-convergence warning surfaces through the
    sparse_generic_solve boundary in eager use (VERDICT round-3 item 6:
    a user must be able to tell a converged solve from a max-iter
    bailout)."""
    from torchsparsegradutils_tpu import sparse_generic_solve
    A = _spd(key)
    b = jax.random.normal(jax.random.fold_in(key, 1), (24,))
    st = LinearCGSettings(max_iter=1, rtol=1e-14, min_iter=1)
    with pytest.warns(UserWarning, match="did not converge"):
        _ = sparse_generic_solve(A, b, solve=linear_cg,
                                 transpose_solve=linear_cg, settings=st)
