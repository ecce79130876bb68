"""Sparse structure utilities: conversions, block-diagonal, eye, stacking.

TPU-native rebuild of the reference's structure helpers
(``/root/reference/torchsparsegradutils/utils/utils.py``):

* ``coo_to_csr`` / ``csr_to_coo``  — reference ``convert_coo_to_csr``
  (utils.py:349-410) and ``_demcompress_crow_indices`` (utils.py:413-470).
* ``coo_to_csr_indices_values`` — reference utils.py:236-346 (also returns the
  sort permutation, which drives the CSR mode of the pairwise encoder).
* ``sparse_block_diag`` / ``sparse_block_diag_split`` — utils.py:474-790.
  NOTE: in this library batching is native (leading batch dims + vmap inside
  ops), so block-diagonalisation is provided for parity/tests and for users
  who genuinely want one big block-diagonal operator — it is NOT the batching
  mechanism.
* ``sparse_eye`` — utils.py:793-912.
* ``sparse_stack`` — reference ``stack_csr`` (utils.py:6-88), generalised to
  both layouts.
* ``coalesce`` — the host-side analogue of torch's ``Tensor.coalesce()``;
  in a static-shape world deduplication is a pre-jit pattern operation.

Pattern work happens on host (numpy) for pattern-static containers — the
common case — with traced jnp fallbacks where feasible.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..types import SparseCOO, SparseCSR, is_sparse

__all__ = [
    "coo_to_csr",
    "coo_to_csr_indices_values",
    "csr_to_coo",
    "csr_transpose",
    "coalesce",
    "sparse_block_diag",
    "sparse_block_diag_split",
    "sparse_eye",
    "sparse_stack",
]


# --------------------------------------------------------------------------
# COO <-> CSR
# --------------------------------------------------------------------------

def _compress_rows_np(row: np.ndarray, n: int) -> np.ndarray:
    """Sorted row indices -> indptr (reference utils.py:152-233)."""
    from .. import native
    return native.compress_rows(row, n, dtype=row.dtype)


def coo_to_csr_indices_values(coo: SparseCOO):
    """Return ``(indptr, col_indices, permutation)`` for a COO pattern.

    The permutation maps the COO nonzero order to CSR order; feeding
    ``data[..., perm]`` alongside gives the CSR values.  Mirrors the
    reference's ``convert_coo_to_csr_indices_values`` with ``values=None``
    (utils.py:236-346), which powers the encoder's CSR mode.
    Host-side: requires a concrete pattern.
    """
    from .. import native
    row = coo.rows_np("coo_to_csr conversion")
    col = coo.cols_np("coo_to_csr conversion")
    n = coo.shape[-2]
    m = coo.shape[-1]
    if row.ndim == 1:
        perm = native.lexsort_rowcol(row, col, m)
        return _compress_rows_np(row[perm], n), col[perm], perm
    flat_r = row.reshape(-1, coo.nnz)
    flat_c = col.reshape(-1, coo.nnz)
    indptrs, cols, perms = [], [], []
    for r, c in zip(flat_r, flat_c):
        p = native.lexsort_rowcol(r, c, m)
        indptrs.append(_compress_rows_np(r[p], n))
        cols.append(c[p])
        perms.append(p)
    bshape = row.shape[:-1]
    return (np.stack(indptrs).reshape(bshape + (n + 1,)),
            np.stack(cols).reshape(bshape + (coo.nnz,)),
            np.stack(perms).reshape(bshape + (coo.nnz,)))


def _permute_data(data: jax.Array, perm: np.ndarray, n_batch: int) -> jax.Array:
    """Apply a (possibly batched) static permutation along the nnz axis.

    Unbatched f32/bf16 streams ride ``kernels.shuffle.permute_values``:
    same flat gather forward (the per-entry relayout floor — the
    expansion-gather alternative measured no faster, see shuffle.py),
    but the VJP is the inverse permutation by the same gather instead of
    autodiff's unsorted scatter-add (~25 ms at 3M entries on v5e).  This
    is the value reorder behind ``coo_to_csr`` and every container
    transpose."""
    if perm.ndim == 1:
        if data.ndim == 1 and data.dtype in (jnp.float32, jnp.bfloat16):
            from ..kernels.shuffle import permute_values
            from ..types import StaticArray
            return permute_values(
                StaticArray(np.ascontiguousarray(perm.astype(np.int64))),
                data)
        return jnp.take(data, jnp.asarray(perm), axis=-1)
    # batched perm: data (*B, nnz), perm (*Bp, nnz) with Bp == B
    perm_b = jnp.broadcast_to(jnp.asarray(perm), data.shape)
    return jnp.take_along_axis(data, perm_b, axis=-1)


def coo_to_csr(coo: SparseCOO) -> SparseCSR:
    """Convert COO -> CSR (reference utils.py:349-410)."""
    if not isinstance(coo, SparseCOO):
        raise TypeError(f"expected SparseCOO, got {type(coo)}")
    if coo.pattern_static or not isinstance(coo.rows(), jax.core.Tracer):
        indptr, col, perm = coo_to_csr_indices_values(coo)
        data = _permute_data(coo.data, perm, coo.n_batch)
        return SparseCSR(indptr, col, data, coo.shape,
                         pattern_static=coo.pattern_static)
    # traced pattern (dynamic mode, unbatched indices only)
    row, col = coo.rows(), coo.cols()
    if row.ndim != 1:
        raise ValueError("traced coo_to_csr supports unbatched patterns only")
    n = coo.shape[-2]
    perm = jnp.lexsort((col, row))
    row_s = jnp.take(row, perm)
    counts = jnp.bincount(row_s, length=n)
    indptr = jnp.concatenate([jnp.zeros((1,), row.dtype),
                              jnp.cumsum(counts).astype(row.dtype)])
    data = jnp.take(coo.data, perm, axis=-1)
    return SparseCSR(indptr, jnp.take(col, perm), data, coo.shape,
                     pattern_static=False, _skip_checks=True)


def csr_to_coo(csr: SparseCSR) -> SparseCOO:
    return csr.tocoo()


def csr_transpose(csr: SparseCSR) -> SparseCSR:
    """Transpose a CSR matrix (pattern work on host for static patterns)."""
    coo = csr.tocoo()
    t = coo.transpose()
    return coo_to_csr(t)


def coalesce(coo: SparseCOO) -> SparseCOO:
    """Sum duplicate coordinates and sort row-major (host-side pattern op).

    The static-shape analogue of torch COO ``.coalesce()``: the deduplicated
    nnz becomes the new static nnz.  Requires a concrete pattern and,
    when batched with per-element patterns, equal deduplicated nnz.
    """
    row = coo.rows_np("coalesce")
    col = coo.cols_np("coalesce")
    m = coo.shape[-1]
    if row.ndim == 1:
        keys = row.astype(np.int64) * m + col.astype(np.int64)
        uniq, inv = np.unique(keys, return_inverse=True)
        nr = (uniq // m).astype(row.dtype)
        nc = (uniq % m).astype(col.dtype)
        seg = jnp.asarray(inv)
        data = coo.data
        if coo.n_batch == 0:
            new_data = jax.ops.segment_sum(data, seg, num_segments=len(uniq))
        else:
            flat = data.reshape(-1, coo.nnz)
            new_data = jax.vmap(
                lambda d: jax.ops.segment_sum(d, seg, num_segments=len(uniq))
            )(flat).reshape(coo.batch_shape + (len(uniq),))
        return SparseCOO(nr, nc, new_data, coo.shape,
                         pattern_static=coo.pattern_static)
    # per-element patterns
    flat_r = row.reshape(-1, coo.nnz)
    flat_c = col.reshape(-1, coo.nnz)
    flat_d = coo.data.reshape(-1, coo.nnz)
    outs = []
    for r, c, d in zip(flat_r, flat_c, flat_d):
        outs.append(coalesce(SparseCOO(r, c, d, coo.shape[-2:],
                                       pattern_static=True)))
    nnzs = {o.nnz for o in outs}
    if len(nnzs) != 1:
        raise ValueError(
            f"coalesce on batched per-element patterns produced unequal nnz "
            f"{sorted(nnzs)}; static shapes require equal nnz")
    nnz = nnzs.pop()
    nr = np.stack([o.rows_np() for o in outs]).reshape(row.shape[:-1] + (nnz,))
    nc = np.stack([o.cols_np() for o in outs]).reshape(row.shape[:-1] + (nnz,))
    nd = jnp.stack([o.data for o in outs]).reshape(coo.batch_shape + (nnz,))
    return SparseCOO(nr, nc, nd, coo.shape, pattern_static=coo.pattern_static)


# --------------------------------------------------------------------------
# block-diagonal
# --------------------------------------------------------------------------

def sparse_block_diag(*mats: Union[SparseCOO, SparseCSR]):
    """Assemble sparse matrices into one block-diagonal matrix.

    Reference ``sparse_block_diag`` (utils.py:474-645).  Accepts 2-D
    containers of one layout; a single batched (3-D) container is also
    accepted and treated as its list of slices.
    """
    if len(mats) == 1 and is_sparse(mats[0]) and mats[0].ndim == 3:
        src = mats[0]
        mats = tuple(_batch_slice(src, i) for i in range(src.shape[0]))
    if not mats:
        raise ValueError("sparse_block_diag requires at least one matrix")
    if not all(is_sparse(m) and m.ndim == 2 for m in mats):
        raise ValueError("all inputs must be 2-D sparse containers")
    layout = mats[0].layout
    if not all(m.layout == layout for m in mats):
        raise ValueError("all inputs must share a layout")
    n_tot = sum(m.shape[0] for m in mats)
    m_tot = sum(m.shape[1] for m in mats)
    if layout == "coo":
        rows, cols, datas = [], [], []
        r_off = c_off = 0
        for m in mats:
            rows.append(m.rows_np("sparse_block_diag") + r_off)
            cols.append(m.cols_np("sparse_block_diag") + c_off)
            datas.append(m.data)
            r_off += m.shape[0]
            c_off += m.shape[1]
        return SparseCOO(np.concatenate(rows), np.concatenate(cols),
                         jnp.concatenate(datas), (n_tot, m_tot),
                         pattern_static=mats[0].pattern_static)
    # CSR: concatenate row pointers with cumulative nnz offsets
    indptrs, cols, datas = [], [], []
    nnz_off = c_off = 0
    for i, m in enumerate(mats):
        ip = m.indptr_np("sparse_block_diag")
        start = 0 if i == 0 else 1
        indptrs.append(ip[start:] + nnz_off)
        cols.append(m.cols_np("sparse_block_diag") + c_off)
        datas.append(m.data)
        nnz_off += m.nnz
        c_off += m.shape[1]
    return SparseCSR(np.concatenate(indptrs), np.concatenate(cols),
                     jnp.concatenate(datas), (n_tot, m_tot),
                     pattern_static=mats[0].pattern_static)


def _batch_slice(sp, i: int):
    """Extract 2-D slice i of a singly-batched container."""
    data = sp.data[i]
    if sp.layout == "coo":
        r = sp.rows_np("batch slicing")
        c = sp.cols_np("batch slicing")
        if r.ndim > 1:
            r, c = r[i], c[i]
        return SparseCOO(r, c, data, sp.shape[-2:],
                         pattern_static=sp.pattern_static)
    ip = sp.indptr_np("batch slicing")
    ix = sp.cols_np("batch slicing")
    if ip.ndim > 1:
        ip, ix = ip[i], ix[i]
    return SparseCSR(ip, ix, data, sp.shape[-2:],
                     pattern_static=sp.pattern_static)


def sparse_block_diag_split(sp, *shapes: Tuple[int, int]):
    """Split a block-diagonal sparse matrix back into blocks.

    Inverse of :func:`sparse_block_diag` (reference utils.py:648-790).
    Block shapes must tile the diagonal exactly and each block's nnz is
    whatever falls inside it.
    """
    if not shapes:
        raise ValueError("provide at least one block shape")
    out = []
    if sp.layout == "coo":
        row = sp.rows_np("sparse_block_diag_split")
        col = sp.cols_np("sparse_block_diag_split")
        r_off = c_off = 0
        for (bn, bm) in shapes:
            mask = ((row >= r_off) & (row < r_off + bn)
                    & (col >= c_off) & (col < c_off + bm))
            idx = np.nonzero(mask)[0]
            out.append(SparseCOO(row[idx] - r_off, col[idx] - c_off,
                                 jnp.take(sp.data, jnp.asarray(idx), axis=-1),
                                 (bn, bm), pattern_static=sp.pattern_static))
            r_off += bn
            c_off += bm
        return tuple(out)
    ip = sp.indptr_np("sparse_block_diag_split")
    ix = sp.cols_np("sparse_block_diag_split")
    r_off = c_off = 0
    for (bn, bm) in shapes:
        lo, hi = int(ip[r_off]), int(ip[r_off + bn])
        sub_ip = (ip[r_off:r_off + bn + 1] - lo)
        sub_ix = ix[lo:hi] - c_off
        if sub_ix.size and (sub_ix.min() < 0 or sub_ix.max() >= bm):
            raise ValueError("matrix has entries outside the diagonal blocks")
        out.append(SparseCSR(sub_ip, sub_ix,
                             jax.lax.slice_in_dim(sp.data, lo, hi, axis=-1),
                             (bn, bm), pattern_static=sp.pattern_static))
        r_off += bn
        c_off += bm
    return tuple(out)


# --------------------------------------------------------------------------
# constructors
# --------------------------------------------------------------------------

def sparse_eye(shape, *, layout: str = "coo", value_dtype=jnp.float32,
               index_dtype=jnp.int32, pattern_static: bool = True):
    """Sparse identity, optionally batched (reference utils.py:793-912)."""
    shape = tuple(int(s) for s in shape)
    if len(shape) < 2 or shape[-1] != shape[-2]:
        raise ValueError(f"sparse_eye requires a square trailing shape, got {shape}")
    n = shape[-1]
    idx = np.arange(n, dtype=np.dtype(index_dtype))
    data = jnp.ones(shape[:-2] + (n,), dtype=value_dtype)
    if layout == "coo":
        return SparseCOO(idx, idx, data, shape, pattern_static=pattern_static)
    if layout == "csr":
        indptr = np.arange(n + 1, dtype=np.dtype(index_dtype))
        return SparseCSR(indptr, idx, data, shape,
                         pattern_static=pattern_static)
    raise ValueError(f"unknown layout {layout!r}")


def sparse_stack(mats: Sequence[Union[SparseCOO, SparseCSR]]):
    """Stack 2-D sparse matrices with equal shape/nnz into one batched
    container (reference ``stack_csr``, utils.py:6-88, extended to COO)."""
    mats = list(mats)
    if not mats:
        raise ValueError("sparse_stack requires at least one matrix")
    layout = mats[0].layout
    shape = mats[0].shape
    nnz = mats[0].nnz
    if not all(m.layout == layout and m.shape == shape and m.nnz == nnz
               for m in mats):
        raise ValueError("all matrices must share layout, shape, and nnz")
    if any(m.ndim != 2 for m in mats):
        raise ValueError("sparse_stack stacks 2-D matrices")
    data = jnp.stack([m.data for m in mats])
    new_shape = (len(mats),) + shape
    if layout == "coo":
        rows = np.stack([m.rows_np("sparse_stack") for m in mats])
        cols = np.stack([m.cols_np("sparse_stack") for m in mats])
        if (rows == rows[0]).all() and (cols == cols[0]).all():
            rows, cols = rows[0], cols[0]
        return SparseCOO(rows, cols, data, new_shape,
                         pattern_static=mats[0].pattern_static)
    ips = np.stack([m.indptr_np("sparse_stack") for m in mats])
    ixs = np.stack([m.cols_np("sparse_stack") for m in mats])
    if (ips == ips[0]).all() and (ixs == ixs[0]).all():
        ips, ixs = ips[0], ixs[0]
    return SparseCSR(ips, ixs, data, new_shape,
                     pattern_static=mats[0].pattern_static)
