"""Sparse @ dense matmul with sparsity-preserving gradients, plus SDDMM.

TPU-native rebuild of the reference's core mechanism
(``/root/reference/torchsparsegradutils/sparse_matmul.py``):

* ``sparse_mm(A, B)`` — forward SpMM (reference :8-163); the backward
  computes ``gradA`` **only at A's stored nonzeros** via a sampled
  dense-dense matmul (SDDMM, reference :165-234) and
  ``gradB = Aᵀ @ grad`` — so gradients stay O(nnz) where a naive rule
  would materialise the dense ``G @ Bᵀ``.
* ``sddmm(A, X, Y)`` — the shared gradient-sampling primitive
  (``out[i,j] = dot(X[i,:], Y[j,:])`` at A's pattern), exposed publicly and
  reused by every solve/lstsq VJP in this library (the reference re-inlines
  this recipe five times; here it is one differentiable primitive).

Design notes (TPU-first):

* Batching is ``jax.vmap`` over leading dims — NOT the reference's
  block-diagonalisation (sparse_matmul.py:151-153), which would produce
  dynamic layouts XLA can't tile.
* The XLA path lowers to gather + segment-sum, which XLA/Mosaic map well;
  a Pallas BCSR kernel can be selected with ``backend="pallas"`` for large
  matrices (see ``torchsparsegradutils_tpu.kernels``).
* Integer index inputs receive ``float0`` cotangents, making the custom
  VJPs valid under ``jit`` / ``vmap`` / higher-order ``grad``.
"""

from __future__ import annotations

from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.dtypes import float0

from ..types import SparseCOO, SparseCSR, is_sparse

__all__ = ["sparse_mm", "sddmm"]


def _int_zero(x):
    return np.zeros(jnp.shape(x), dtype=float0)


# --------------------------------------------------------------------------
# core custom-vjp kernels (unbatched, raw arrays)
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_core(n, sorted_rows, backend, row, col, data, B):
    return _spmm_impl(n, sorted_rows, backend, row, col, data, B)


def _spmm_impl(n, sorted_rows, backend, row, col, data, B):
    if backend == "pallas":
        from ..kernels import dispatch
        out = dispatch.spmm_pallas(n, row, col, data, B)
        if out is not None:
            return out
    prod = data[:, None] * jnp.take(B, col, axis=0)
    return jax.ops.segment_sum(prod, row, num_segments=n,
                               indices_are_sorted=sorted_rows)


def _spmm_fwd(n, sorted_rows, backend, row, col, data, B):
    return _spmm_core(n, sorted_rows, backend, row, col, data, B), \
        (row, col, data, B)


def _spmm_bwd(n, sorted_rows, backend, res, g):
    row, col, data, B = res
    # gradA sampled at the pattern: SDDMM(g, B) at (row, col)
    d_data = _sddmm_core(row, col, g, B)
    # gradB = Aᵀ @ g : scatter-add over columns
    d_B = jax.ops.segment_sum(data[:, None] * jnp.take(g, row, axis=0),
                              col, num_segments=B.shape[0])
    return (_int_zero(row), _int_zero(col), d_data, d_B)


_spmm_core.defvjp(_spmm_fwd, _spmm_bwd)


@jax.custom_vjp
def _sddmm_core(row, col, X, Y):
    return (jnp.take(X, row, axis=0) * jnp.take(Y, col, axis=0)).sum(-1)


def _sddmm_fwd(row, col, X, Y):
    return _sddmm_core(row, col, X, Y), (row, col, X, Y)


def _sddmm_bwd(res, g):
    row, col, X, Y = res
    d_X = jax.ops.segment_sum(g[:, None] * jnp.take(Y, col, axis=0), row,
                              num_segments=X.shape[0])
    d_Y = jax.ops.segment_sum(g[:, None] * jnp.take(X, row, axis=0), col,
                              num_segments=Y.shape[0])
    return (_int_zero(row), _int_zero(col), d_X, d_Y)


_sddmm_core.defvjp(_sddmm_fwd, _sddmm_bwd)


# --------------------------------------------------------------------------
# container-level helpers
# --------------------------------------------------------------------------

def _row_col(A) -> tuple:
    """(row, col, sorted_rows) as jnp-usable arrays for any layout."""
    if isinstance(A, SparseCOO):
        return A.rows(), A.cols(), False
    return A.rows(), A.cols(), True


def _check_sparse_dense(A, B, op_name: str):
    if not is_sparse(A):
        raise TypeError(f"{op_name}: A must be SparseCOO or SparseCSR, "
                        f"got {type(A).__name__}")
    if is_sparse(B):
        raise TypeError(f"{op_name}: B must be a dense array, got sparse")
    B = B if isinstance(B, jax.core.Tracer) else jnp.asarray(B)
    if A.ndim not in (2, 3):
        raise ValueError(f"{op_name}: A must be 2-D or batched 3-D, "
                         f"got {A.ndim}-D")
    if A.dtype != B.dtype:
        raise ValueError(f"{op_name}: dtype mismatch, A is {A.dtype} and "
                         f"B is {B.dtype}")
    return B


def sparse_mm(A: Union[SparseCOO, SparseCSR], B, *, backend: str = "auto"):
    """Multiply a sparse matrix by a dense matrix: ``A @ B``.

    Args:
      A: ``(n, m)`` or batched ``(b, n, m)`` sparse container.  Gradients
        w.r.t. ``A`` are returned only at its stored nonzeros.
      B: dense ``(m, p)`` or ``(b, m, p)`` array; batch dims must match A's
        (one side may be unbatched and is broadcast).
      backend: "auto" | "xla" | "pallas".

    Returns:
      Dense ``(n, p)`` / ``(b, n, p)`` array.

    Reference: ``sparse_mm`` (sparse_matmul.py:8-129) and ``SparseMatMul``
    (:141-234); batching here is vmap, not block-diagonalisation.
    """
    B = _check_sparse_dense(A, B, "sparse_mm")
    if B.ndim not in (2, 3):
        raise ValueError(f"sparse_mm: B must be 2-D or batched 3-D, got "
                         f"{B.ndim}-D")
    if A.shape[-1] != B.shape[-2]:
        raise ValueError(f"sparse_mm: inner dims disagree, A has shape "
                         f"{A.shape} and B has shape {B.shape}")
    if A.ndim == 3 and B.ndim == 3 and A.shape[0] != B.shape[0]:
        raise ValueError(f"sparse_mm: batch dims disagree, {A.shape[0]} vs "
                         f"{B.shape[0]}")

    n = A.shape[-2]
    row, col, srt = _row_col(A)
    core = lambda r, c, d, b: _spmm_core(n, srt, backend, r, c, d, b)

    if A.ndim == 2 and B.ndim == 2:
        return core(row, col, A.data, B)
    if A.ndim == 2:  # B batched
        return jax.vmap(lambda b: core(row, col, A.data, b))(B)
    # A batched
    data = A.data
    if row.ndim == 1:  # shared pattern
        if B.ndim == 2:
            return jax.vmap(lambda d: core(row, col, d, B))(data)
        return jax.vmap(lambda d, b: core(row, col, d, b))(data, B)
    row = jnp.asarray(row)
    col = jnp.asarray(col)
    if B.ndim == 2:
        return jax.vmap(lambda r, c, d: core(r, c, d, B))(row, col, data)
    return jax.vmap(core)(row, col, data, B)


def sddmm(A: Union[SparseCOO, SparseCSR], X, Y,
          *, backend: str = "auto"):
    """Sampled dense-dense matmul: ``(X @ Yᵀ)`` evaluated at A's pattern.

    Args:
      A: sparse container supplying the pattern (values unused),
        shape ``(n, m)`` or ``(b, n, m)``.
      X: dense ``(n, k)`` (or batched ``(b, n, k)``).
      Y: dense ``(m, k)`` (or batched).

    Returns:
      A container with the same pattern as A and values
      ``v[e] = dot(X[row[e]], Y[col[e]])``.

    This is the shared gradient-sampling primitive behind every
    sparsity-preserving backward in this library (reference recipe at
    sparse_matmul.py:184-219, sparse_solve.py:217-242, 488-515,
    sparse_lstsq.py:231-266).
    """
    X = jnp.asarray(X) if not isinstance(X, jax.core.Tracer) else X
    Y = jnp.asarray(Y) if not isinstance(Y, jax.core.Tracer) else Y
    if not is_sparse(A):
        raise TypeError("sddmm: A must be SparseCOO or SparseCSR")
    if X.ndim != Y.ndim or X.shape[-1] != Y.shape[-1]:
        raise ValueError(f"sddmm: X {X.shape} and Y {Y.shape} must share "
                         "ndim and trailing (contraction) dim")
    if X.shape[-2] != A.shape[-2] or Y.shape[-2] != A.shape[-1]:
        raise ValueError(f"sddmm: X {X.shape} / Y {Y.shape} do not match "
                         f"pattern shape {A.shape}")
    row, col, _ = _row_col(A)
    if A.ndim == 2 and X.ndim == 2:
        return A.with_data(_sddmm_core(jnp.asarray(row), jnp.asarray(col),
                                       X, Y))
    if A.ndim == 2 and X.ndim == 3:
        raise ValueError("sddmm: batched X/Y with an unbatched pattern is "
                         "ambiguous; pass a batched pattern container")
    if A.ndim == 3:
        if X.ndim == 2:
            X = jnp.broadcast_to(X, (A.shape[0],) + X.shape)
            Y = jnp.broadcast_to(Y, (A.shape[0],) + Y.shape)
        if row.ndim == 1:
            vals = jax.vmap(lambda x, y: _sddmm_core(
                jnp.asarray(row), jnp.asarray(col), x, y))(X, Y)
        else:
            vals = jax.vmap(_sddmm_core)(jnp.asarray(row), jnp.asarray(col),
                                         X, Y)
        return A.with_data(vals)
    raise ValueError(f"sddmm: unsupported ndim combination A={A.ndim}, "
                     f"X={X.ndim}")
