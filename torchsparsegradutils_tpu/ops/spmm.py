"""Sparse @ dense matmul with sparsity-preserving gradients, plus SDDMM.

TPU-native rebuild of the reference's core mechanism
(``/root/reference/torchsparsegradutils/sparse_matmul.py``):

* ``sparse_mm(A, B)`` — forward SpMM (reference :8-163); the backward
  computes ``gradA`` **only at A's stored nonzeros** via a sampled
  dense-dense matmul (SDDMM, reference :165-234) and
  ``gradB = Aᵀ @ grad`` — so gradients stay O(nnz) where a naive rule
  would materialise the dense ``G @ Bᵀ``.
* ``sddmm(A, X, Y)`` — the shared gradient-sampling primitive
  (``out[i,j] = dot(X[i,:], Y[j,:])`` at A's pattern), reused by every
  solve/lstsq VJP in this library (the reference re-inlines this recipe
  five times; here it is one differentiable primitive).

Execution strategy (TPU-first; measured on v5e — see kernels/ell.py):
static patterns are repacked host-side into cached row-ELL and
column-ELL (transpose) plans so that **every** forward and backward is
scatter-free — gathers only, which run ~an order of magnitude faster than
scatter-adds on TPU:

  fwd      out = Σ_k ev[i,k]·B[ec[i,k]]      (row-ELL gather + contract)
  d_data   X=G streams row-aligned, Y=B gathered (row-ELL SDDMM)
  d_B      Aᵀ@G via the column-ELL plan      (gather G rows)

Dynamic patterns (traced indices) and degree-skewed patterns fall back to
gather + ``segment_sum``.  Batching is ``jax.vmap`` over leading dims —
NOT the reference's block-diagonalisation (sparse_matmul.py:151-153).

Example:
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> from torchsparsegradutils_tpu import SparseCOO, sparse_mm
    >>> A = SparseCOO(np.array([0, 0, 1]), np.array([0, 2, 1]),
    ...               jnp.array([1.0, 2.0, 3.0]), (2, 3))
    >>> B = jnp.ones((3, 2))
    >>> out = sparse_mm(A, B)
    >>> bool(jnp.allclose(out, A.todense() @ B))
    True
    >>> g = jax.grad(lambda d: sparse_mm(A.with_data(d), B).sum())(A.data)
    >>> g.shape         # gradient only at the 3 stored nonzeros
    (3,)
"""

from __future__ import annotations

from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import dispatch
from ..kernels.chunk_spmm import (
    build_chunk_plan,
    build_chunk_plan_transpose,
    chunk_sddmm,
    chunk_spmm,
    chunk_spmm_bwd_fused,
    chunk_spmv,
)
from ..kernels.dia import (
    build_dia_plan,
    dia_sddmm,
    dia_spmm,
    dia_spmm_transpose,
)
from ..kernels.ell import build_ell_plan, ell_sddmm, ell_spmm
from ..types import SparseCOO, SparseCSR, as_device_array, is_sparse
from .common import sparse_cotangent

__all__ = ["sparse_mm", "sddmm"]


# --------------------------------------------------------------------------
# plan lookup
# --------------------------------------------------------------------------

def _plans(A, backend: str):
    """(row_plan, col_plan) for a 2-D static, unbatched pattern; else
    (None, None).

    NOTE: measured end-to-end on v5e, the straightforward gather +
    segment-sum formulation benefits from XLA CSE across the fused
    forward+backward (shared G gathers) and beats piecewise-optimal ELL
    compositions; ELL therefore runs only on explicit ``backend="ell"``
    (it wins for standalone forwards with low row-degree skew)."""
    if backend != "ell":
        return None, None
    rs, cs = A.row_sa(), A.col_sa()
    if rs is None or cs is None or rs.arr.ndim != 1:
        return None, None
    n, m = A.mat_shape
    return (build_ell_plan(rs, cs, n, m), build_ell_plan(cs, rs, m, n))


def _dia_batch_cap() -> int:
    """Max batch size the batched-DIA path unrolls in Python (the DIA
    kernels DMA from ANY-space operands and cannot be vmapped): each
    element adds a full kernel instantiation to the program, so compile
    time is O(batch).  Above the cap, ``backend="auto"`` routes batched
    ops to the vmappable chunk/XLA paths; explicit ``backend="dia"``
    still unrolls (caller opted in).  Override: ``TSGU_DIA_BATCH_CAP``.
    """
    import os
    return int(os.environ.get("TSGU_DIA_BATCH_CAP", "8"))


def _dia_plan(A, backend: str):
    """DIA plan for a 2-D static pattern, or None.

    DIA wins whenever it applies (stencil/banded/encoder patterns): it
    replaces every per-entry gather with statically shifted dense
    streams, at any RHS width including p=1 SpMV.
    """
    if backend not in ("auto", "dia"):
        return None
    rs, cs = A.row_sa(), A.col_sa()
    plan = None
    if rs is not None and cs is not None and rs.arr.ndim == 1:
        n, m = A.mat_shape
        plan = build_dia_plan(rs, cs, n, m)
    if plan is None and backend == "dia":
        raise ValueError(
            "backend='dia' requires a static 2-D diagonal-structured "
            "pattern (<=256 diagonal offsets covering >=70% of nnz); "
            "this pattern does not qualify — use backend='auto' for "
            "automatic dispatch")
    return plan


def _pallas_ok(A, p: int, backend: str) -> bool:
    """Whether the Pallas chunk kernels should handle this op."""
    if backend == "pallas":
        return True
    if backend != "auto":
        return False
    # auto: real TPU only, reasonably wide RHS (p=1 matvecs pad 128x)
    return dispatch.on_tpu() and p >= 32 and A.dtype in (
        jnp.float32, jnp.bfloat16)


def _chunk_plan(A, backend: str, transpose: bool = False):
    rs, cs = A.row_sa(), A.col_sa()
    if rs is None or cs is None or rs.arr.ndim != 1:
        return None
    n, m = A.mat_shape
    if transpose:
        return build_chunk_plan_transpose(rs, cs, n, m)
    return build_chunk_plan(rs, cs, n, m)


def _fallback_spmm(n, sorted_rows, row, col, data, B):
    prod = data[:, None] * jnp.take(B, as_device_array(col), axis=0)
    return jax.ops.segment_sum(prod, as_device_array(row), num_segments=n,
                               indices_are_sorted=sorted_rows)


def _fallback_sddmm(row, col, X, Y):
    # as_device_array: a raw numpy index array would inline as an HLO
    # literal (40-80 MB at nnz~1e7 — the remote compiler rejects it)
    return (jnp.take(X, as_device_array(row), axis=0)
            * jnp.take(Y, as_device_array(col), axis=0)).sum(-1)


EXPAND_MIN_NNZ = 100_000   # below this the XLA row gather is fine


def _sorted_row_expand(A, X):
    """(nnz, p) row-aligned X stream via the monotone window-gather.

    The XLA formulation ``take(X, rows)`` is one HBM transaction per
    entry (~11-22 ms at 1.5-3M nnz on v5e) even though ``rows`` is
    sorted — each source row is read by a contiguous run of entries, so
    the map is a monotone expansion that the window kernel streams at
    ~1-2 ms.  This is the X-side of the narrow-RHS SDDMM (the dominant
    term of the triangular-solve backward at p=2).  Returns None when
    not applicable (dynamic pattern, small nnz, wide RHS, f64, CPU —
    force with ``TSGU_EXPAND_GATHER=force`` for interpret-mode tests).
    """
    import os
    rs = A.row_sa()
    if rs is None or rs.arr.ndim != 1:
        return None
    p = X.shape[-1]
    if os.environ.get("TSGU_EXPAND_GATHER") != "force":
        if not dispatch.on_tpu() or A.nnz < EXPAND_MIN_NNZ or p > 8:
            return None
    if X.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    rows = rs.arr
    if rows.size > 1 and (np.diff(rows) < 0).any():
        return None
    from ..kernels.window_gather import build_expand_plan, window_gather
    plan = build_expand_plan(rs, A.shape[-2])
    if plan is None:
        return None
    return jnp.stack([window_gather(plan, X[:, j]) for j in range(p)],
                     axis=1)


def _spmv_ok(A, p: int, backend: str) -> bool:
    """p=1 matvec via the chunk-SpMV kernel (scatter-free combine)."""
    if p != 1:
        return False
    if backend == "pallas":
        return True
    return (backend == "auto" and dispatch.on_tpu()
            and A.dtype in (jnp.float32, jnp.bfloat16))


def _spmm_forward(backend, A, B):
    dplan = _dia_plan(A, backend)
    if dplan is not None:
        return dia_spmm(dplan, A.data, B)
    if _spmv_ok(A, B.shape[-1], backend):
        plan = _chunk_plan(A, backend)
        if plan is not None:
            return chunk_spmv(plan, A.data, B[:, 0])[:, None]
    if _pallas_ok(A, B.shape[-1], backend):
        plan = _chunk_plan(A, backend)
        if plan is not None:
            return chunk_spmm(plan, A.data, B)
    rp, _ = _plans(A, backend)
    if rp is not None:
        return ell_spmm(rp, A.data, B)
    return _fallback_spmm(A.shape[-2], A.layout == "csr", A.rows(),
                          A.cols(), A.data, B)


def _sddmm_values(backend, A, X, Y):
    dplan = _dia_plan(A, backend)
    if dplan is not None:
        return dia_sddmm(dplan, X, Y)
    if _pallas_ok(A, Y.shape[-1], backend):
        plan = _chunk_plan(A, backend)
        if plan is not None:
            return chunk_sddmm(plan, X, Y)
    rp, _ = _plans(A, backend)
    if rp is not None:
        return ell_sddmm(rp, X, Y)
    if backend in ("auto", "xla"):
        Xe = _sorted_row_expand(A, X)
        if Xe is not None:
            return (Xe * jnp.take(Y, as_device_array(A.cols()), axis=0)
                    ).sum(-1)
    return _fallback_sddmm(A.rows(), A.cols(), X, Y)


def _spmm_transpose(backend, A, G):
    """Aᵀ @ G (n, p) -> (m, p).

    Measured: the unsorted segment-sum fuses with the shared G gather in
    the combined backward and edges out the col-ELL variant (which pays an
    unsorted conversion scatter); col-ELL is used only on explicit
    ``backend="ell"``."""
    dplan = _dia_plan(A, backend)
    if dplan is not None:
        return dia_spmm_transpose(dplan, A.data, G)
    if _spmv_ok(A, G.shape[-1], backend):
        plan_t = _chunk_plan(A, backend, transpose=True)
        if plan_t is not None:
            return chunk_spmv(plan_t, A.data, G[:, 0])[:, None]
    if backend == "ell":
        _, cp = _plans(A, backend)
        if cp is not None:
            return ell_spmm(cp, A.data, G)
    m = A.shape[-1]
    prod = A.data[:, None] * jnp.take(G, as_device_array(A.rows()),
                                       axis=0)
    return jax.ops.segment_sum(prod, as_device_array(A.cols()),
                               num_segments=m)


# --------------------------------------------------------------------------
# container-level custom VJPs (2-D cores)
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_cv(backend, grad_precision, A, B):
    return _spmm_forward(backend, A, B)


def _spmm_cv_fwd(backend, grad_precision, A, B):
    # pallas path: re-derive the forward's gathered B rows as a residual so
    # the fused backward skips one full random re-gather of B.  The primal
    # must come from the custom rule itself (higher-order linearization);
    # XLA CSE merges this take with the identical one inside the forward.
    out = _spmm_cv(backend, grad_precision, A, B)
    pg = None
    dplan = _dia_plan(A, backend)
    if dplan is not None:
        # DIA path: the residual is the diagonal value grid — the backward
        # transpose-SpMM then pays no fill relayout (XLA CSE merges this
        # values_to_grid with the identical one inside the forward).  On
        # hybrid plans whose residual runs the chunk engine, the forward's
        # B-row gather rides along too (CSE'd with the one inside
        # chunk_spmm), saving the fused backward a random re-gather.
        from ..kernels.dia import (_resid_chunk_ok, _resid_chunk_plans,
                                   values_to_grid)
        pg = values_to_grid(dplan, A.data)
        if _resid_chunk_ok(dplan, B.shape[-1], B.dtype):
            from ..kernels.chunk_spmm import chunk_gather
            rp, _ = _resid_chunk_plans(dplan)
            pg = (pg, chunk_gather(rp, B))
    elif _pallas_ok(A, B.shape[-1], backend):
        plan = _chunk_plan(A, backend)
        if plan is not None:
            from ..kernels.chunk_spmm import chunk_gather
            pg = chunk_gather(plan, B)
    return out, (A, B, pg)


def _spmm_cv_bwd(backend, grad_precision, res, g):
    A, B, pg = res
    d_data, d_B = _spmm_bwd_pair(backend, grad_precision, A, B, g, pg)
    return sparse_cotangent(A, d_data), d_B


_spmm_cv.defvjp(_spmm_cv_fwd, _spmm_cv_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_bwd_pair(backend, grad_precision, A, B, g, pg):
    """(d_data, d_B) of ``A @ B`` given output cotangent g.

    First-order: one fused Pallas pass (SDDMM values + V rows) plus a
    column-order row-sum — no per-entry value permutation.  Its own VJP
    (for higher-order grads) is expressed in plain differentiable ops.

    ``pg`` is the forward's precomputed residual (or None): on the chunk
    path ``chunk_gather(plan, B)`` (derived from B), on the DIA path
    ``values_to_grid(dplan, A.data)`` (derived from A.data).  Either way
    it is a pure re-layout of another argument, so in this function's own
    VJP its cotangent is zero and all sensitivity is re-attributed to the
    source argument (d_B on the chunk path, d_data on the DIA path) —
    passing a residual that does not match the dispatch path would make
    that re-attribution silently wrong.
    """
    dplan = _dia_plan(A, backend)
    if dplan is not None:
        # pg here is the forward's residual — the values_to_grid grid, or
        # (grid, resid_B_gather) on hybrid chunk-routed plans (or None
        # when this pair is called outside the spmm VJP)
        from ..kernels.dia import dia_bwd_pair
        return dia_bwd_pair(dplan, A.data, B, g, gv=pg,
                            fast=(grad_precision == "fast"))
    if _pallas_ok(A, B.shape[-1], backend):
        plan = _chunk_plan(A, backend)
        plan_t = _chunk_plan(A, backend, transpose=True)
        if plan is not None and plan_t is not None:
            from ..kernels.dia import _spmm_bwd_mode
            if _spmm_bwd_mode() == "split":
                # Beneš-era split backward: the CSC value permutation is
                # ~1.6 ms / 3M values (kernels/benes.py), so d_B runs as
                # a plain transpose chunk SpMM — no (nnz, p) V matrix
                from ..kernels.chunk_spmm import chunk_sddmm, chunk_spmm
                return (chunk_sddmm(plan, g, B, pg=pg),
                        chunk_spmm(plan_t, A.data, g))
            out = chunk_spmm_bwd_fused(plan, plan_t, A.data, B, g, pg=pg,
                                       fast=(grad_precision == "fast"))
            return out
    d_data = _sddmm_values(backend, A, g, B)
    d_B = _spmm_transpose(backend, A, g)
    return d_data, d_B


def _spmm_bwd_pair_fwd(backend, grad_precision, A, B, g, pg):
    return _spmm_bwd_pair(backend, grad_precision, A, B, g, pg), \
        (A, B, g, pg)


def _spmm_bwd_pair_bwd(backend, grad_precision, res, cts):
    A, B, g, pg = res
    ct_dd, ct_dB = cts
    ct_sp = A.with_data(ct_dd)
    # d_data = sddmm(g, B) at pattern; d_B = Aᵀ g
    d_Adata = _fallback_sddmm(A.rows(), A.cols(), g, ct_dB)
    d_B = _spmm_transpose("xla", ct_sp, g)
    d_g = _spmm_forward("xla", ct_sp, B) + _spmm_forward("xla", A, ct_dB)
    d_pg = (None if pg is None
            else jax.tree_util.tree_map(jnp.zeros_like, pg))
    return sparse_cotangent(A, d_Adata), d_B, d_g, d_pg


_spmm_bwd_pair.defvjp(_spmm_bwd_pair_fwd, _spmm_bwd_pair_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sddmm_cv(backend, A, X, Y):
    return A.with_data(_sddmm_values(backend, A, X, Y))


def _sddmm_cv_fwd(backend, A, X, Y):
    return _sddmm_cv(backend, A, X, Y), (A, X, Y)


def _sddmm_cv_bwd(backend, res, ct):
    A, X, Y = res
    g = ct.data  # cotangent container: values cotangent
    G_sp = A.with_data(g)
    # d_X[i] = Σ_e∈row(i) g_e · Y[col_e]  == (pattern∘g) @ Y
    d_X = _spmm_forward(backend, G_sp, Y)
    # d_Y[j] = Σ_e∈col(j) g_e · X[row_e]  == (pattern∘g)ᵀ @ X
    d_Y = _spmm_transpose(backend, G_sp, X)
    return sparse_cotangent(A, jnp.zeros_like(A.data)), d_X, d_Y


_sddmm_cv.defvjp(_sddmm_cv_fwd, _sddmm_cv_bwd)


# --------------------------------------------------------------------------
# public ops
# --------------------------------------------------------------------------

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


def _elem(A, i):
    """Unbatched view of batch element i of a batched container.  Shared
    (1-D) patterns reuse the existing index wrappers (no re-hashing)."""
    from ..types import StaticArray

    def narrow(x):
        arr = x.arr if isinstance(x, StaticArray) else x
        if getattr(arr, "ndim", 1) == 1:
            return x  # shared pattern: reuse wrapper as-is
        arr = arr[i]
        return StaticArray(np.ascontiguousarray(arr)) if isinstance(
            x, StaticArray) else arr

    if isinstance(A, SparseCOO):
        obj = object.__new__(SparseCOO)
        obj.row, obj.col = narrow(A.row), narrow(A.col)
    else:
        obj = object.__new__(SparseCSR)
        obj.indptr, obj.indices = narrow(A.indptr), narrow(A.indices)
    obj.data = A.data[i]
    obj.shape = A.shape[-2:]
    obj.pattern_static = A.pattern_static
    return obj


def sparse_mm(A: Union[SparseCOO, SparseCSR], B, *, backend: str = "auto",
              grad_precision: str = "exact"):
    """Multiply a sparse matrix by a dense matrix: ``A @ B``.

    Args:
      A: ``(n, m)`` or batched ``(b, n, m)`` sparse container.  Gradients
        w.r.t. ``A`` are returned only at its stored nonzeros.
      B: dense ``(m, p)`` or ``(b, m, p)`` array; batch dims must match A's
        (one side may be unbatched and is broadcast).
      backend: "auto" | "dia" | "ell" | "xla" | "pallas".  "auto"
        prefers the DIA (diagonal-structured) plan when the pattern is a
        union of few diagonals (stencil/banded/encoder matrices — zero
        gathers on TPU), then the Pallas chunk kernels, then XLA.
      grad_precision: "exact" (default) or "fast" — the fast mode stores
        the backward's intermediate product matrix in bfloat16 (gradA
        values stay exact; gradB gains ~1e-3 relative error).
        Experimental: on v5e the random V-row gather is transaction-bound,
        so no speedup was measured there; parts with byte-bound gathers
        may benefit.

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

    gp = grad_precision
    if A.ndim == 2 and B.ndim == 2:
        return _spmm_cv(backend, gp, A, B)
    if A.ndim == 2:  # B batched
        return jax.vmap(lambda b: _spmm_cv(backend, gp, A, b))(B)
    # A batched
    A0 = _elem(A, 0)
    if not A.indices_batched():  # shared pattern: vmap over data
        if _dia_plan(A0, backend) is not None:
            if A.shape[0] <= _dia_batch_cap() or backend == "dia":
                # DIA kernels DMA from ANY-space operands, which the
                # Pallas vmap batching rule cannot block-spec on TPU —
                # unroll the (static, small) batch instead
                outs = [_spmm_cv(backend, gp, A0.with_data(A.data[i]),
                                 B if B.ndim == 2 else B[i])
                        for i in range(A.shape[0])]
                return jnp.stack(outs)
            # above the cap the O(batch) program size would blow compile
            # time — route to the vmappable chunk/XLA path instead
            backend = "pallas"
        if B.ndim == 2:
            return jax.vmap(
                lambda d: _spmm_cv(backend, gp, A0.with_data(d), B)
            )(A.data)
        return jax.vmap(
            lambda d, b: _spmm_cv(backend, gp, A0.with_data(d), b)
        )(A.data, B)
    # per-element patterns: traced-index fallback under one vmap
    row = as_device_array(A.rows())
    col = as_device_array(A.cols())
    n = A.shape[-2]
    core = lambda r, c, d, b: _dyn_spmm(n, r, c, d, b)
    if B.ndim == 2:
        return jax.vmap(lambda r, c, d: core(r, c, d, B))(row, col, A.data)
    return jax.vmap(core)(row, col, A.data, B)


@jax.custom_vjp
def _dyn_spmm(n, row, col, data, B):
    return _fallback_spmm(n, False, row, col, data, B)


if True:  # wire VJP for the dynamic-pattern raw-array core
    from jax.dtypes import float0

    def _int_zero(x):
        return np.zeros(jnp.shape(x), dtype=float0)

    def _dyn_spmm_fwd(n, row, col, data, B):
        return _dyn_spmm(n, row, col, data, B), (row, col, data, B)

    def _dyn_spmm_bwd(res, g):
        row, col, data, B = res
        d_data = _fallback_sddmm(row, col, g, B)
        d_B = jax.ops.segment_sum(
            data[:, None] * jnp.take(g, row, axis=0), col,
            num_segments=B.shape[0])
        return (None, _int_zero(row), _int_zero(col), d_data, d_B)

    _dyn_spmm.defvjp(_dyn_spmm_fwd, _dyn_spmm_bwd)


def sddmm(A: Union[SparseCOO, SparseCSR], X, Y, *, backend: str = "auto"):
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
    if A.ndim == 2 and X.ndim == 2:
        return _sddmm_cv(backend, A, X, Y)
    if A.ndim == 2 and X.ndim == 3:
        raise ValueError("sddmm: batched X/Y with an unbatched pattern is "
                         "ambiguous; pass a batched pattern container")
    if A.ndim == 3:
        if X.ndim == 2:
            X = jnp.broadcast_to(X, (A.shape[0],) + X.shape)
            Y = jnp.broadcast_to(Y, (A.shape[0],) + Y.shape)
        if not A.indices_batched():
            A0 = _elem(A, 0)
            if (_dia_plan(A0, backend) is not None
                    and (A.shape[0] <= _dia_batch_cap()
                         or backend == "dia")):
                # see sparse_mm: ANY-space DMA kernels cannot be vmapped
                vals = jnp.stack(
                    [_sddmm_cv(backend, A0, X[i], Y[i]).data
                     for i in range(A.shape[0])])
            else:
                # beyond the DIA batch cap: vmappable chunk/XLA path
                be = "pallas" if (backend == "auto"
                                  and _dia_plan(A0, backend) is not None
                                  ) else backend
                vals = jax.vmap(
                    lambda x, y: _sddmm_cv(be, A0, x, y).data)(X, Y)
        else:
            row = as_device_array(A.rows())
            col = as_device_array(A.cols())
            vals = jax.vmap(_dyn_sddmm)(row, col, X, Y)
        return A.with_data(vals)
    raise ValueError(f"sddmm: unsupported ndim combination A={A.ndim}, "
                     f"X={X.ndim}")


@jax.custom_vjp
def _dyn_sddmm(row, col, X, Y):
    return _fallback_sddmm(row, col, X, Y)


def _dyn_sddmm_fwd(row, col, X, Y):
    return _dyn_sddmm(row, col, X, Y), (row, col, X, Y)


def _dyn_sddmm_bwd(res, g):
    from jax.dtypes import float0
    row, col, X, Y = res
    d_X = jax.ops.segment_sum(g[:, None] * jnp.take(Y, col, axis=0), row,
                              num_segments=X.shape[0])
    d_Y = jax.ops.segment_sum(g[:, None] * jnp.take(X, row, axis=0), col,
                              num_segments=Y.shape[0])
    return (np.zeros(jnp.shape(row), dtype=float0),
            np.zeros(jnp.shape(col), dtype=float0), d_X, d_Y)


_dyn_sddmm.defvjp(_dyn_sddmm_fwd, _dyn_sddmm_bwd)
