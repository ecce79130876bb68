"""Sparse log-sum-exp reductions (uni- and bi-directional).

TPU-native rebuild of the reference's
``/root/reference/torchsparsegradutils/sparse_logsumexp.py``:

* ``sparse_logsumexp`` (:246-351) — logsumexp over ``dim`` of a 2-D or
  batched 3-D sparse tensor with dense-equivalent (``include_zeros=True``)
  or support-mask (``include_zeros=False``) semantics.
* ``sparse_bidir_logsumexp`` (:354-496) — row- and column-wise reductions in
  one traversal, sharing a single segment reduction over stacked indices.
* ``_scatter_logsumexp`` (:10-73) — the numerically stable max-shifted
  scatter kernel; here a fused pair of ``jax.ops.segment_max`` /
  ``segment_sum`` with the shift detached via ``lax.stop_gradient``.

Differentiation is plain JAX autodiff through the data values (the reference
likewise relies on torch autograd, test_sparse_logsumexp.py:244-262) — the
gradient w.r.t. the sparse input lives on its stored values only, by
construction.  Batch dims are folded into the segment index (one reduction
kernel regardless of batching, reference :141-172).

Notes vs the reference:
* layouts: COO and CSR (a CSC matrix is representable as the CSR of the
  transpose; the reference's CSC branch reads the same index arrays).
* ``output_layout="nested"`` is not provided — JAX has no ragged container;
  use ``"tuple"`` (stable) or ``"padded"``.
* patterns are assumed duplicate-free (use ``utils.coalesce`` first; the
  reference coalesces COO on the fly, which has no static-shape analogue).

Example:
    >>> import jax, jax.numpy as jnp
    >>> from torchsparsegradutils_tpu import sparse_logsumexp
    >>> from torchsparsegradutils_tpu.utils import rand_sparse
    >>> A = rand_sparse(jax.random.PRNGKey(0), (10, 8), 30)
    >>> out = sparse_logsumexp(A, dim=1)
    >>> ref = jax.scipy.special.logsumexp(A.todense(), axis=1)
    >>> bool(jnp.allclose(out, ref, atol=1e-5))
    True
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

from ..types import SparseCOO, SparseCSR, as_device_array, is_sparse

__all__ = ["sparse_logsumexp", "sparse_bidir_logsumexp"]


def _scatter_logsumexp(values, seg, n_groups: int, n_zeros_per_group,
                       sorted_seg: bool = False):
    """Stable log-sum-exp of ``values`` scattered into ``n_groups`` groups.

    values/seg: flat ``(N,)`` arrays. ``n_zeros_per_group``: ``(n_groups,)``
    count of structural zeros contributing ``exp(0)=1`` each, or None.
    Empty groups return ``-inf``.
    """
    max_val = jax.ops.segment_max(values, seg, num_segments=n_groups,
                                  indices_are_sorted=sorted_seg)
    if n_zeros_per_group is not None:
        has_zeros = n_zeros_per_group > 0
        max_val = jnp.where(has_zeros, jnp.maximum(max_val, 0.0), max_val)
    shift = jax.lax.stop_gradient(
        jnp.where(jnp.isfinite(max_val), max_val, 0.0))
    shifted_exp = jnp.exp(values - jnp.take(shift, seg))
    sum_exp = jax.ops.segment_sum(shifted_exp, seg, num_segments=n_groups,
                                  indices_are_sorted=sorted_seg)
    if n_zeros_per_group is not None:
        zeros_contrib = n_zeros_per_group.astype(values.dtype) * jnp.exp(-shift)
        sum_exp = sum_exp + jnp.where(has_zeros, zeros_contrib, 0.0)
    empty = sum_exp == 0.0
    safe = jnp.where(empty, 1.0, sum_exp)
    return jnp.where(empty, -jnp.inf, shift + jnp.log(safe))


def _flat_indices(A) -> tuple:
    """(rows, cols, values, batch_size) flattened over batch.

    rows/cols/values come back as ``(B, nnz)`` (B=1 when unbatched)."""
    rows = as_device_array(A.rows())
    cols = as_device_array(A.cols())
    vals = A.data
    if A.ndim == 2:
        return rows[None], cols[None], vals[None], 1
    b = A.shape[0]
    if rows.ndim == 1:
        rows = jnp.broadcast_to(rows, (b, A.nnz))
        cols = jnp.broadcast_to(cols, (b, A.nnz))
    return rows, cols, vals, b


def _validate_dims(ndim: int, dim) -> list:
    dims_list = [dim] if isinstance(dim, int) else list(dim)
    if not dims_list:
        raise ValueError("sparse_logsumexp: dim must not be empty")
    for d in dims_list:
        if not -ndim <= d < ndim:
            raise IndexError(
                f"Dimension out of range (expected to be in range of "
                f"[{-ndim}, {ndim - 1}], but got {d})")
    normalised = [d % ndim for d in dims_list]
    if len(set(normalised)) != len(normalised):
        raise ValueError("sparse_logsumexp: dim contains a repeated dimension")
    return sorted(normalised)


def _dia_lse_plan(A, backend: str):
    """The (plan, grid) pair of the DIA LSE path, or None when out of
    scope — split out so the bidirectional op fills the grid ONCE and
    feeds both direction reductions (a genuinely shared traversal, not
    a reliance on XLA CSE merging two identical fills)."""
    from ..kernels.dia import build_dia_plan, values_to_grid

    if backend not in ("auto", "dia"):
        return None
    if A.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    rs, cs = A.row_sa(), A.col_sa()
    if rs is None or cs is None or rs.arr.ndim != 1:
        return None
    n, m = A.mat_shape
    dia = build_dia_plan(rs, cs, n, m)
    if dia is None or dia.is_hybrid:
        return None
    return dia, values_to_grid(dia, A.data)


def _dia_lse(A, include_zeros: bool, over_cols: bool, backend: str,
             planned=None):
    """DIA fast path: LSE as a row reduction over the (n, K) diagonal
    value grid — one fused streaming pass, no segment scatters at all.
    The column direction uses the transposed grid (static column shifts,
    no value permutation).  Gradients flow through the differentiable
    grid relayout (``values_to_grid``'s custom VJP)."""
    import numpy as np

    from ..kernels.dia import _transpose_grid

    if planned is None:
        planned = _dia_lse_plan(A, backend)
    if planned is None:
        return None
    dia, grid = planned
    n, m = A.mat_shape
    valid = (dia.src_of_grid >= 0).reshape(n, dia.K)
    if over_cols:
        offsets_T, shift = _transpose_grid(dia)
        grid = shift(grid)
        # validity shifts exactly like the values
        valid_T = np.zeros((m, dia.K), bool)
        order = np.argsort(-dia.offsets)
        for kT, k in enumerate(order):
            off = int(dia.offsets[k])
            lo_s = max(0, off)
            hi_s = min(m, n + off)
            if hi_s > lo_s:
                valid_T[lo_s:hi_s, kT] = valid[lo_s - off:hi_s - off, k]
        valid = valid_T
        width = n
    else:
        width = m
    from ..kernels.grid_lse import masked_lse_kn
    # as_device_array, NOT jnp.asarray: a raw-numpy capture inlines as a
    # host constant that JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS's hoister
    # rejects ("TypedNdArray has no attribute sharding", jax 0.9.0)
    vmaskT = as_device_array(np.ascontiguousarray(valid.T))
    cnt = as_device_array(valid.sum(axis=1))
    return masked_lse_kn(grid.T, vmaskT, cnt, width, include_zeros)


def _chunked_lse(A, include_zeros: bool, over_cols: bool, backend: str,
                 dia_planned=None):
    """Pallas one-pass LSE for 2-D static patterns; None if the path does
    not apply.  Row direction prefers the ELL-grid streaming kernel
    (monotone fill + fused dense reduce, kernels/grid_lse.py); the chunk
    kernel remains for degree-skewed patterns."""
    from ..kernels import dispatch
    from ..kernels.chunk_lse import lse_fn, lse_fn_transposed
    from ..kernels.grid_lse import grid_lse_fn

    if backend == "xla":
        return None
    out = _dia_lse(A, include_zeros, over_cols, backend,
                   planned=dia_planned)
    if out is not None:
        return out
    if backend == "dia":
        return None
    if backend != "pallas" and not dispatch.on_tpu():
        return None
    if A.ndim != 2 or A.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    rs, cs = A.row_sa(), A.col_sa()
    if rs is None or cs is None or rs.arr.ndim != 1:
        return None
    n, m = A.mat_shape
    if over_cols:
        res = lse_fn_transposed(rs, cs, n, m, include_zeros)
        if res is None:
            return None
        fn, reorder = res
        return fn(reorder(A.data))
    fn = grid_lse_fn(rs, cs, n, m, include_zeros)
    if fn is None:
        fn = lse_fn(rs, cs, n, m, include_zeros)
    if fn is None:
        return None
    return fn(A.data)


def _bidir_fused_fn(A, include_zeros: bool, backend: str):
    """Cached fused bidirectional grid-LSE callable, or None out of
    scope (dynamic pattern, degree-skewed grids, xla backend, off-TPU
    without pallas interpret opt-in)."""
    from ..kernels import dispatch
    from ..kernels.grid_lse import bidir_grid_fns

    if backend in ("xla", "dia"):
        return None
    if backend != "pallas" and not dispatch.on_tpu():
        return None
    if A.ndim != 2 or A.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    rs, cs = A.row_sa(), A.col_sa()
    if rs is None or cs is None or rs.arr.ndim != 1:
        return None
    n, m = A.mat_shape
    return bidir_grid_fns(rs, cs, n, m, include_zeros)


def sparse_logsumexp(A: Union[SparseCOO, SparseCSR],
                     dim: Union[int, Sequence[int]],
                     keepdim: bool = False,
                     include_zeros: bool = True,
                     backend: str = "auto"):
    """Log-sum-exp along ``dim`` of a sparse matrix, O(nnz) memory.

    ``include_zeros=True`` treats absent entries as genuine zeros (each
    contributing ``exp(0)=1``), matching dense ``logsumexp(A.todense())``;
    ``include_zeros=False`` treats them as ``-inf`` (support-mask semantics;
    empty rows/columns come back ``-inf``).

    2-D input: ``dim`` in {0, 1, [0, 1]}.  Batched 3-D input: the batch axis
    (0) cannot be reduced; ``dim`` selects from {1, 2}.
    Reference: ``sparse_logsumexp`` (sparse_logsumexp.py:246-351).
    """
    from ..types import SparseCSC
    if isinstance(A, SparseCSC):
        # CSC is the transpose's CSR (reference reads CSC directly,
        # sparse_logsumexp.py:76-102): reduce the swapped dimension and
        # re-apply keepdim on the original axes
        dims = _validate_dims(2, dim)
        swapped = [1 - d for d in dims]
        out = sparse_logsumexp(A.transpose_csr(),
                               swapped if len(swapped) > 1 else swapped[0],
                               keepdim=False, include_zeros=include_zeros,
                               backend=backend)
        if keepdim:
            if len(dims) == 2:
                out = jnp.reshape(out, (1, 1))
            elif dims == [0]:
                out = out[None, :]
            else:
                out = out[:, None]
        return out
    if not is_sparse(A):
        raise TypeError("sparse_logsumexp: input must be SparseCOO/SparseCSR")
    if A.ndim not in (2, 3):
        raise NotImplementedError(
            f"sparse_logsumexp supports 2-D or batched 3-D input, got "
            f"ndim={A.ndim}")
    dims = _validate_dims(A.ndim, dim)
    batched = A.ndim == 3
    if batched and 0 in dims:
        raise NotImplementedError(
            "Cannot reduce the batch dimension (0) of a batched 3-D sparse "
            "tensor")
    nrows, ncols = A.mat_shape
    red = [d - 1 for d in dims] if batched else dims  # within-matrix dims

    if not batched and len(red) == 1:
        out = _chunked_lse(A, include_zeros, over_cols=(red == [0]),
                           backend=backend)
        if out is not None:
            if keepdim:
                out = out[None, :] if red == [0] else out[:, None]
            return out

    rows, cols, vals, b = _flat_indices(A)

    if red == [0]:        # reduce over rows -> one value per column
        seg_in, n_groups, width = cols, ncols, nrows
    elif red == [1]:      # reduce over columns -> one value per row
        seg_in, n_groups, width = rows, nrows, ncols
    else:                 # [0, 1]: reduce to one value per (batch) slice
        seg_in, n_groups, width = jnp.zeros_like(rows), 1, nrows * ncols

    b_off = jnp.arange(b, dtype=seg_in.dtype)[:, None] * n_groups
    seg = (seg_in + b_off).reshape(-1)
    flat_vals = vals.reshape(-1)
    total = b * n_groups
    if include_zeros:
        counts = jax.ops.segment_sum(jnp.ones_like(seg), seg,
                                     num_segments=total)
        n_zeros = width - counts
    else:
        n_zeros = None
    out = _scatter_logsumexp(flat_vals, seg, total, n_zeros)
    out = out.reshape((b, n_groups))

    # shape conventions of torch.logsumexp
    if not batched:
        out = out[0]
        if len(red) == 2:
            out = out[0]  # scalar
        if keepdim:
            if len(red) == 2:
                out = jnp.reshape(out, (1, 1))
            elif red == [0]:
                out = out[None, :]
            else:
                out = out[:, None]
        return out
    if len(red) == 2:
        out = out[:, 0]
        if keepdim:
            out = out[:, None, None]
        return out
    out = out  # (b, n_groups)
    if keepdim:
        out = out[:, None, :] if red == [0] else out[:, :, None]
    return out


def sparse_bidir_logsumexp(A: Union[SparseCOO, SparseCSR],
                           keepdim: bool = False,
                           include_zeros: bool = True,
                           output_layout: str = "tuple",
                           backend: str = "auto"):
    """Row- AND column-wise log-sum-exp in one traversal.

    Returns ``(col_lse, row_lse)`` — the reduction over rows (one value per
    column) first, then the reduction over columns (one value per row) —
    matching the reference's order (sparse_logsumexp.py:354-496).  With
    ``output_layout="padded"`` returns one dense ``(2, G)`` / ``(2, b, G)``
    array, ``G = max(r, c)``, padded with ``-inf``.

    Both reductions share a single stacked segment reduction: every nonzero
    contributes to both outputs from one extraction (reference
    ``_bidir_2d``/``_bidir_batched``, :175-243).
    """
    from ..types import SparseCSC
    if isinstance(A, SparseCSC):
        res = sparse_bidir_logsumexp(A.transpose_csr(), keepdim=keepdim,
                                     include_zeros=include_zeros,
                                     output_layout=output_layout,
                                     backend=backend)
        if output_layout == "padded":
            return res[::-1]         # (col, row) of Aᵀ == (row, col) of A
        c_t, r_t = res               # col-LSE of Aᵀ == row-LSE of A
        if keepdim:                  # re-orient keepdim axes for A
            return r_t.reshape(1, -1), c_t.reshape(-1, 1)
        return r_t, c_t
    if not is_sparse(A):
        raise TypeError(
            "sparse_bidir_logsumexp: input must be SparseCOO/SparseCSR")
    if A.ndim not in (2, 3):
        raise NotImplementedError(
            f"sparse_bidir_logsumexp supports 2-D or batched 3-D input, got "
            f"ndim={A.ndim}")
    if output_layout == "nested":
        raise NotImplementedError(
            "output_layout='nested' has no JAX analogue (no ragged "
            "containers); use 'tuple' or 'padded'")
    if output_layout not in ("tuple", "padded"):
        raise ValueError(
            f"sparse_bidir_logsumexp: unknown output_layout "
            f"{output_layout!r}; expected 'tuple' or 'padded'")
    if keepdim and output_layout != "tuple":
        raise ValueError(
            "sparse_bidir_logsumexp: keepdim is only supported with "
            "output_layout='tuple'")

    batched = A.ndim == 3
    nrows, ncols = A.mat_shape
    G = max(nrows, ncols)

    if not batched:
        # one traversal: the DIA grid is filled once and both direction
        # reductions consume it (the column direction via static shifts)
        planned = _dia_lse_plan(A, backend)
        col_lse = row_lse = None
        if planned is None:
            # generic static patterns: fused pair — one CSR->CSC value
            # permutation (Beneš), both ELL grid fills, one stacked
            # masked reduce (kernels/grid_lse.py:bidir_grid_fns)
            fused = _bidir_fused_fn(A, include_zeros, backend)
            if fused is not None:
                col_lse, row_lse = fused(A.data)
        if row_lse is None:
            row_lse = _chunked_lse(A, include_zeros, over_cols=False,
                                   backend=backend, dia_planned=planned)
            col_lse = _chunked_lse(A, include_zeros, over_cols=True,
                                   backend=backend, dia_planned=planned) \
                if row_lse is not None else None
        if col_lse is not None:
            if output_layout == "padded":
                ninf = jnp.array(-jnp.inf, row_lse.dtype)
                return jnp.stack([
                    jnp.pad(col_lse, (0, G - ncols),
                            constant_values=ninf),
                    jnp.pad(row_lse, (0, G - nrows),
                            constant_values=ninf)])
            if keepdim:
                return col_lse[None, :], row_lse[:, None]
            return col_lse, row_lse

    rows, cols, vals, b = _flat_indices(A)

    # direction 0: col_lse (segment by column); direction 1: row_lse (by row)
    b_off = jnp.arange(b, dtype=rows.dtype)[:, None] * G
    seg0 = (cols + b_off).reshape(-1)
    seg1 = (rows + b_off).reshape(-1) + b * G
    seg = jnp.concatenate([seg0, seg1])
    flat_vals = jnp.concatenate([vals.reshape(-1)] * 2)
    total = 2 * b * G
    if include_zeros:
        counts = jax.ops.segment_sum(jnp.ones_like(seg), seg,
                                     num_segments=total)
        width = jnp.concatenate([
            jnp.where(jnp.arange(b * G) % G < ncols, nrows, 0),
            jnp.where(jnp.arange(b * G) % G < nrows, ncols, 0)])
        n_zeros = width - counts
    else:
        n_zeros = None
    out = _scatter_logsumexp(flat_vals, seg, total, n_zeros)
    padded = out.reshape(2, b, G)

    if output_layout == "padded":
        return padded if batched else padded[:, 0, :]
    col_lse = padded[0, :, :ncols]
    row_lse = padded[1, :, :nrows]
    if not batched:
        col_lse, row_lse = col_lse[0], row_lse[0]
    if keepdim:
        if batched:
            col_lse, row_lse = col_lse[:, None, :], row_lse[:, :, None]
        else:
            col_lse, row_lse = col_lse[None, :], row_lse[:, None]
    return col_lse, row_lse
