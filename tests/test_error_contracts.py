"""Exact-message error contracts for the public ops (reference archetype:
test_sparse_matmul.py:162-212's ValueError tables)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import (
    SparseCOO,
    sddmm,
    sparse_generic_lstsq,
    sparse_generic_solve,
    sparse_logsumexp,
    sparse_mm,
    sparse_triangular_solve,
)
from torchsparsegradutils_tpu.utils import rand_sparse, rand_sparse_tri

KEY = jax.random.PRNGKey(0)


def _A(shape=(6, 5), nnz=10, **kw):
    return rand_sparse(KEY, shape, nnz, **kw)


def exact(msg):
    return "^" + re.escape(msg) + "$"


class TestSparseMmErrors:
    def test_dense_A(self):
        with pytest.raises(TypeError, match=re.escape(
                "sparse_mm: A must be SparseCOO or SparseCSR, got "
                "ArrayImpl")):
            sparse_mm(jnp.ones((3, 3)), jnp.ones((3, 2)))

    def test_sparse_B(self):
        with pytest.raises(TypeError, match=re.escape(
                "sparse_mm: B must be a dense array, got sparse")):
            sparse_mm(_A(), _A((5, 4)))

    def test_inner_dim_mismatch(self):
        with pytest.raises(ValueError, match=re.escape(
                "sparse_mm: inner dims disagree, A has shape (6, 5) and B "
                "has shape (4, 2)")):
            sparse_mm(_A(), jnp.ones((4, 2)))

    def test_dtype_mismatch(self):
        with pytest.raises(ValueError, match=re.escape(
                "sparse_mm: dtype mismatch, A is float32 and B is int32")):
            sparse_mm(_A(), jnp.ones((5, 2), jnp.int32))

    def test_B_rank(self):
        with pytest.raises(ValueError, match=re.escape(
                "sparse_mm: B must be 2-D or batched 3-D, got 4-D")):
            sparse_mm(_A(), jnp.ones((1, 1, 5, 2)))


class TestSddmmErrors:
    def test_trailing_dim(self):
        with pytest.raises(ValueError, match=re.escape(
                "sddmm: X (6, 3) and Y (5, 4) must share ndim and trailing "
                "(contraction) dim")):
            sddmm(_A(), jnp.ones((6, 3)), jnp.ones((5, 4)))

    def test_pattern_mismatch(self):
        with pytest.raises(ValueError, match=re.escape(
                "sddmm: X (7, 3) / Y (5, 3) do not match pattern shape "
                "(6, 5)")):
            sddmm(_A(), jnp.ones((7, 3)), jnp.ones((5, 3)))


class TestBackendDiaErrors:
    """backend='dia' must refuse (not silently fall back from) patterns
    that fail the DIA gate — mirrors sparse_triangular_solve's
    algorithm='dia' contract."""

    def test_spmm_non_dia_pattern_raises(self):
        # uniform-random 64x64: far more than 256 distinct offsets needed
        A = rand_sparse(KEY, (64, 64), 512)
        with pytest.raises(ValueError, match=re.escape(
                "backend='dia' requires a static 2-D diagonal-structured "
                "pattern")):
            sparse_mm(A, jnp.ones((64, 4)), backend="dia")

    def test_sddmm_non_dia_pattern_raises(self):
        A = rand_sparse(KEY, (64, 64), 512)
        with pytest.raises(ValueError, match=re.escape(
                "backend='dia' requires a static 2-D diagonal-structured "
                "pattern")):
            sddmm(A, jnp.ones((64, 4)), jnp.ones((64, 4)), backend="dia")

    def test_spmm_dia_pattern_accepts(self):
        from torchsparsegradutils_tpu.utils.random_sparse import (
            stencil_sparse,
        )
        A = stencil_sparse(KEY, (64, 64), (-1, 0, 1))
        out = sparse_mm(A, jnp.ones((64, 4)), backend="dia")
        assert out.shape == (64, 4)


class TestTriangularErrors:
    def test_not_square(self):
        with pytest.raises(ValueError, match=re.escape(
                "sparse_triangular_solve: A must be square")):
            sparse_triangular_solve(_A((6, 5)), jnp.ones((6, 2)))

    def test_unit_with_explicit_diag(self):
        A = rand_sparse_tri(KEY, (6, 6), 12, upper=False)  # includes diag
        with pytest.raises(ValueError, match=re.escape(
                "sparse_triangular_solve: unitriangular=True requires a "
                "pattern without explicit diagonal entries")):
            sparse_triangular_solve(A, jnp.ones((6, 2)), upper=False,
                                    unitriangular=True)

    def test_wave_too_small(self):
        A = rand_sparse_tri(KEY, (6, 6), 12, upper=False)
        with pytest.raises(ValueError, match=re.escape(
                "algorithm='wave' needs n > 256")):
            sparse_triangular_solve(A, jnp.ones((6, 2)), upper=False,
                                    algorithm="wave")

    def test_unknown_algorithm(self):
        A = rand_sparse_tri(KEY, (6, 6), 12, upper=False)
        with pytest.raises(ValueError, match=re.escape(
                "unknown algorithm 'fancy'; expected 'auto', 'dia', "
                "'wave', 'block' or 'dense'")):
            sparse_triangular_solve(A, jnp.ones((6, 2)), upper=False,
                                    algorithm="fancy")


class TestSolveErrors:
    def test_not_square(self):
        with pytest.raises(ValueError, match=re.escape(
                "sparse_generic_solve: A must be square")):
            sparse_generic_solve(_A((6, 5)), jnp.ones((6,)))

    def test_shape_mismatch(self):
        with pytest.raises(ValueError, match=re.escape(
                "sparse_generic_solve: incompatible shapes, A (6, 6) vs "
                "B (4,)")):
            sparse_generic_solve(_A((6, 6), 12), jnp.ones((4,)))


class TestLstsqErrors:
    def test_wide_matrix(self):
        with pytest.raises(ValueError, match=re.escape(
                "sparse_generic_lstsq: A should be a tall full-rank "
                "matrix, got shape (5, 6)")):
            sparse_generic_lstsq(_A((5, 6)), jnp.ones((5,)))


class TestLogsumexpErrors:
    def test_dim_out_of_range(self):
        with pytest.raises(IndexError, match=re.escape(
                "Dimension out of range (expected to be in range of "
                "[-2, 1], but got 2)")):
            sparse_logsumexp(_A(), dim=2)

    def test_repeated_dim(self):
        with pytest.raises(ValueError, match=re.escape(
                "sparse_logsumexp: dim contains a repeated dimension")):
            sparse_logsumexp(_A(), dim=(0, 0))

    def test_nested_layout(self):
        from torchsparsegradutils_tpu import sparse_bidir_logsumexp
        with pytest.raises(NotImplementedError, match=re.escape(
                "output_layout='nested' has no JAX analogue")):
            sparse_bidir_logsumexp(_A(), output_layout="nested")

    def test_batch_dim_reduction(self):
        A = rand_sparse(KEY, (2, 6, 5), 10)
        with pytest.raises(NotImplementedError, match=re.escape(
                "Cannot reduce the batch dimension (0) of a batched 3-D "
                "sparse tensor")):
            sparse_logsumexp(A, dim=0)
