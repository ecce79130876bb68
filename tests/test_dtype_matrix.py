"""Dtype / index-dtype / layout cross product over every op family.

Mirror of the reference's matrix (tests/test_config.py:7-9: f32/f64 x
i32/i64 x COO/CSR applied in nearly every test file).  f64 cases enable
x64 mode for their duration; tolerances come from the shared tiers.
"""

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_config import tol
from torchsparsegradutils_tpu import (
    SparseCOO,
    sddmm,
    sparse_generic_solve,
    sparse_logsumexp,
    sparse_mm,
    sparse_triangular_solve,
)
from torchsparsegradutils_tpu.solvers import LinearCGSettings, linear_cg
from torchsparsegradutils_tpu.utils import make_spd_sparse, rand_sparse

VALUE_DTYPES = [jnp.float32, jnp.float64]
INDEX_DTYPES = [jnp.int32, jnp.int64]
LAYOUTS = ["coo", "csr"]


@contextmanager
def maybe_x64(dtype):
    if dtype == jnp.float64:
        old = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", old)
    else:
        yield


def _mk(key, shape, nnz, layout, vdt, idt):
    A = rand_sparse(key, shape, nnz, layout=layout, value_dtype=jnp.float32,
                    index_dtype=idt)
    return A.with_data(jnp.asarray(A.data, vdt))


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("idt", INDEX_DTYPES)
@pytest.mark.parametrize("vdt", VALUE_DTYPES)
class TestSpmmMatrix:
    def test_forward_and_grad(self, key, vdt, idt, layout):
        with maybe_x64(vdt):
            A = _mk(key, (40, 30), 160, layout, vdt, idt)
            B = jax.random.normal(jax.random.fold_in(key, 1), (30, 5), vdt)
            out = sparse_mm(A, B)
            assert out.dtype == vdt
            assert A.index_dtype() == np.dtype(idt)
            np.testing.assert_allclose(out, A.todense() @ B,
                                       **tol("direct", vdt))
            g = jax.grad(lambda d: (sparse_mm(A.with_data(d), B) ** 2
                                    ).sum())(A.data)
            gd = jax.grad(lambda M: ((M @ B) ** 2).sum())(A.todense())
            rows = np.asarray(A.rows())
            cols = np.asarray(A.cols())
            np.testing.assert_allclose(g, np.asarray(gd)[rows, cols],
                                       **tol("direct", vdt))

    def test_sddmm(self, key, vdt, idt, layout):
        with maybe_x64(vdt):
            A = _mk(key, (25, 20), 90, layout, vdt, idt)
            X = jax.random.normal(key, (25, 6), vdt)
            Y = jax.random.normal(jax.random.fold_in(key, 1), (20, 6), vdt)
            out = sddmm(A, X, Y)
            rows = np.asarray(A.rows())
            cols = np.asarray(A.cols())
            ref = np.asarray(X @ Y.T)[rows, cols]
            np.testing.assert_allclose(out.data, ref, **tol("direct", vdt))


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("idt", INDEX_DTYPES)
@pytest.mark.parametrize("vdt", VALUE_DTYPES)
class TestTriangularMatrix:
    @pytest.mark.parametrize("upper", [False, True])
    def test_solve(self, key, vdt, idt, layout, upper):
        with maybe_x64(vdt):
            from torchsparsegradutils_tpu.utils import rand_sparse_tri
            A32 = rand_sparse_tri(key, (30, 30), 110, upper=upper,
                                  layout=layout, well_conditioned=True,
                                  index_dtype=idt)
            A = A32.with_data(jnp.asarray(A32.data, vdt))
            B = jax.random.normal(jax.random.fold_in(key, 2), (30, 3), vdt)
            x = sparse_triangular_solve(A, B, upper=upper)
            ref = jax.scipy.linalg.solve_triangular(A.todense(), B,
                                                    lower=not upper)
            np.testing.assert_allclose(x, ref, **tol("direct", vdt))


@pytest.mark.parametrize("idt", INDEX_DTYPES)
@pytest.mark.parametrize("vdt", VALUE_DTYPES)
class TestSolveMatrix:
    def test_cg_solve_and_grad(self, key, vdt, idt):
        with maybe_x64(vdt):
            A32 = make_spd_sparse(key, 24, 24 + 2 * 30, layout="csr",
                                  index_dtype=idt)
            A = A32.with_data(jnp.asarray(A32.data, vdt))
            b = jax.random.normal(jax.random.fold_in(key, 1), (24,), vdt)
            x = sparse_generic_solve(
                A, b, solve=linear_cg, transpose_solve=linear_cg,
                settings=LinearCGSettings(max_iter=120, rtol=1e-8))
            ref = jnp.linalg.solve(A.todense(), b)
            np.testing.assert_allclose(x, ref, **tol("iterative", vdt))
            g = jax.grad(lambda d: (sparse_generic_solve(
                A.with_data(d), b, solve=linear_cg,
                transpose_solve=linear_cg,
                settings=LinearCGSettings(max_iter=120, rtol=1e-8)) ** 2
                ).sum())(A.data)
            assert g.shape == A.data.shape and g.dtype == vdt
            gd = jax.grad(lambda M: (jnp.linalg.solve(M, b) ** 2).sum())(
                A.todense())
            rows = np.asarray(A.rows())
            cols = np.asarray(A.cols())
            np.testing.assert_allclose(g, np.asarray(gd)[rows, cols],
                                       **tol("iterative", vdt))


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("idt", INDEX_DTYPES)
@pytest.mark.parametrize("vdt", VALUE_DTYPES)
class TestLogsumexpMatrix:
    @pytest.mark.parametrize("dim", [0, 1])
    def test_lse(self, key, vdt, idt, layout, dim):
        with maybe_x64(vdt):
            A = _mk(key, (30, 26), 120, layout, vdt, idt)
            out = sparse_logsumexp(A, dim=dim)
            ref = jax.scipy.special.logsumexp(A.todense(), axis=dim)
            np.testing.assert_allclose(out, ref, **tol("direct", vdt))


@pytest.mark.parametrize("idt", INDEX_DTYPES)
@pytest.mark.parametrize("vdt", VALUE_DTYPES)
class TestLstsqMatrix:
    def test_lstsq(self, key, vdt, idt):
        with maybe_x64(vdt):
            from torchsparsegradutils_tpu import sparse_generic_lstsq
            A32 = rand_sparse(key, (40, 18), 150, layout="csr",
                              index_dtype=idt)
            # full column rank: add a scaled identity block
            dense = np.array(A32.todense())
            dense[:18, :18] += np.eye(18, dtype=np.float32) * 3.0
            rows, cols = np.nonzero(dense)
            A = SparseCOO(rows.astype(np.dtype(idt)),
                          cols.astype(np.dtype(idt)),
                          jnp.asarray(dense[rows, cols], vdt), (40, 18))
            b = jax.random.normal(jax.random.fold_in(key, 1), (40,), vdt)
            from torchsparsegradutils_tpu.solvers import LSMRSettings
            st = LSMRSettings(max_iter=800,
                              atol=1e-12 if vdt == jnp.float64 else 1e-7,
                              btol=1e-12 if vdt == jnp.float64 else 1e-7)
            x = sparse_generic_lstsq(A, b, settings=st)
            ref = jnp.linalg.lstsq(A.todense(), b)[0]
            np.testing.assert_allclose(x, ref, **(
                tol("lstsq", jnp.float32) if vdt == jnp.float32 else
                dict(rtol=1e-8, atol=1e-9)))


@pytest.mark.parametrize("idt", INDEX_DTYPES)
@pytest.mark.parametrize("vdt", VALUE_DTYPES)
class TestIndexedMatmulMatrix:
    def test_segment_mm(self, key, vdt, idt):
        with maybe_x64(vdt):
            from torchsparsegradutils_tpu import segment_mm
            a = jax.random.normal(key, (12, 4), vdt)
            b = jax.random.normal(jax.random.fold_in(key, 1), (3, 4, 5), vdt)
            seg = jnp.asarray([5, 3, 4], idt)
            out = segment_mm(a, b, seg)
            assert out.dtype == vdt
            ref = jnp.concatenate([a[:5] @ b[0], a[5:8] @ b[1],
                                   a[8:] @ b[2]])
            np.testing.assert_allclose(out, ref, **tol("direct", vdt))

    def test_gather_mm(self, key, vdt, idt):
        with maybe_x64(vdt):
            from torchsparsegradutils_tpu import gather_mm
            a = jax.random.normal(key, (10, 4), vdt)
            b = jax.random.normal(jax.random.fold_in(key, 1), (3, 4, 6), vdt)
            idx = jnp.asarray([2, 0, 1, 2, 0, 1, 0, 0, 2, 1], idt)
            out = gather_mm(a, b, idx)
            assert out.dtype == vdt
            ref = jnp.einsum("nk,nkm->nm", a, b[idx])
            np.testing.assert_allclose(out, ref, **tol("direct", vdt))


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("idt", INDEX_DTYPES)
@pytest.mark.parametrize("vdt", VALUE_DTYPES)
def test_bidir_logsumexp_matrix(key, vdt, idt, layout):
    with maybe_x64(vdt):
        from torchsparsegradutils_tpu import sparse_bidir_logsumexp
        A = _mk(key, (24, 20), 90, layout, vdt, idt)
        col_lse, row_lse = sparse_bidir_logsumexp(A)
        d = A.todense()
        np.testing.assert_allclose(
            col_lse, jax.scipy.special.logsumexp(d, axis=0),
            **tol("direct", vdt))
        np.testing.assert_allclose(
            row_lse, jax.scipy.special.logsumexp(d, axis=1),
            **tol("direct", vdt))


@pytest.mark.parametrize("vdt", VALUE_DTYPES)
def test_index_dtype_preserved_through_ops(key, vdt):
    """CSR keeps int32 indices through op round trips (reference README
    documents COO's silent int64 upcast as a torch wart; here both index
    dtypes survive every conversion)."""
    with maybe_x64(vdt):
        A = _mk(key, (20, 20), 60, "csr", vdt, jnp.int32)
        assert A.index_dtype() == np.dtype(jnp.int32)
        assert A.tocoo().index_dtype() == np.dtype(jnp.int32)
        assert A.T.index_dtype() == np.dtype(jnp.int32)
        out = sddmm(A, jax.random.normal(key, (20, 4), vdt),
                    jax.random.normal(key, (20, 4), vdt))
        assert out.index_dtype() == np.dtype(jnp.int32)
