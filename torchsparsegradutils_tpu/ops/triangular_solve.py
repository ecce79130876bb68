"""Sparse triangular solve with sparsity-preserving gradients.

TPU-native rebuild of the reference's ``sparse_triangular_solve``
(``/root/reference/torchsparsegradutils/sparse_solve.py:9-254``): solves
``A x = B`` (or ``Aᵀ x = B``) for sparse triangular A with
``upper`` / ``unitriangular`` / ``transpose`` flags; the backward computes
``gradB = A⁻ᵀ G`` by a transpose triangular solve (:204-206) and
``gradA[i,j] = −dot(gradB[i,:], x[j,:])`` at A's nonzeros, with i/j swapped
under ``transpose`` (:225-237).

Forward algorithm (TPU-first — the reference calls cuSPARSE's sequential
``torch.triangular_solve``): **blocked back-substitution**.  Rows are tiled
into blocks of ``block_size``; the sparsity pattern is preprocessed
host-side (static pattern) into

* dense ``(nblocks, nb, nb)`` diagonal blocks — solved with
  ``jax.scipy.linalg.solve_triangular`` on the MXU, and
* a per-row ELL table of off-diagonal entries — one vectorised gather +
  contraction per block step.

A ``lax.scan`` walks the block rows (reversed for upper-triangular), so the
sequential dependency chain is ``n / block_size`` steps of dense tile work
instead of ``n`` scalar steps.  The transpose solve reuses the same
machinery on the host-transposed pattern (a static permutation of the
traced data).  Entries on the wrong side of the diagonal are ignored, like
dense triangular solves do.

Dynamic-pattern containers (traced indices) cannot be scheduled host-side
and fall back to a densified ``solve_triangular`` (O(n²) memory — fine for
small n, warned about otherwise).

Example:
    >>> import jax, jax.numpy as jnp
    >>> from torchsparsegradutils_tpu import sparse_triangular_solve
    >>> from torchsparsegradutils_tpu.utils.random_sparse import stencil_sparse
    >>> A = stencil_sparse(jax.random.PRNGKey(0), (32, 32), [-4, -1, 0],
    ...                    well_conditioned=True)
    >>> B = jnp.ones((32, 2))
    >>> x = sparse_triangular_solve(A, B, upper=False)
    >>> bool(jnp.allclose(A.todense() @ x, B, atol=1e-4))
    True
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..types import (SparseCOO, SparseCSR, StaticArray, as_device_array,
                      is_sparse)
from .common import sparse_cotangent
from .spmm import sddmm

__all__ = ["sparse_triangular_solve"]


# --------------------------------------------------------------------------
# host-side plan
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class _TriPlan:
    n: int
    nb: int
    nblk: int
    # diagonal-block scatter (indices into data / block coords)
    diag_sel: np.ndarray   # (nd,)
    diag_bi: np.ndarray
    diag_ri: np.ndarray
    diag_ci: np.ndarray
    # off-diagonal ELL tables, shape (nblk, nb, K); ell_sel pads with the
    # sentinel nnz (callers gather from data extended by one zero)
    ell_sel: np.ndarray
    ell_cols: np.ndarray
    nnz: int
    val_gather: object = None


@lru_cache(maxsize=256)
def _build_tri_plan(rows_sa: StaticArray, cols_sa: StaticArray, n: int,
                    nb: int, lower: bool) -> _TriPlan:
    rows = rows_sa.arr.astype(np.int64)
    cols = cols_sa.arr.astype(np.int64)
    nblk = -(-n // nb)
    n_pad = nblk * nb
    rblk = rows // nb
    cblk = cols // nb
    diag_mask = rblk == cblk
    off_mask = (cblk < rblk) if lower else (cblk > rblk)
    # entries on the wrong side of the diagonal outside the block diagonal
    # are ignored (dense-triangular-solve semantics)

    diag_sel = np.nonzero(diag_mask)[0]
    diag_bi = rblk[diag_sel]
    diag_ri = rows[diag_sel] % nb
    diag_ci = cols[diag_sel] % nb

    off_sel = np.nonzero(off_mask)[0]
    off_rows = rows[off_sel]
    order = np.argsort(off_rows, kind="stable")
    off_sel = off_sel[order]
    off_rows = off_rows[order]
    counts = np.bincount(off_rows, minlength=n_pad)
    K = max(int(counts.max()) if len(off_rows) else 0, 1)
    starts = np.zeros(n_pad + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(len(off_rows)) - starts[off_rows]

    nnz = len(rows)
    ell_sel = np.full((n_pad, K), nnz, np.int32)   # sentinel -> zero value
    ell_cols = np.zeros((n_pad, K), np.int32)
    ell_sel[off_rows, slot] = off_sel
    ell_cols[off_rows, slot] = cols[off_sel]

    ell_sel3 = ell_sel.reshape(nblk, nb, K)
    return _TriPlan(n=n, nb=nb, nblk=nblk,
                    diag_sel=diag_sel.astype(np.int32),
                    diag_bi=diag_bi.astype(np.int32),
                    diag_ri=diag_ri.astype(np.int32),
                    diag_ci=diag_ci.astype(np.int32),
                    ell_sel=ell_sel3,
                    ell_cols=ell_cols.reshape(nblk, nb, K), nnz=nnz,
                    val_gather=_make_val_gather(ell_sel3, nnz))


def _blocked_tri_solve(plan: _TriPlan, data, B, *, lower: bool, unit: bool):
    """Core solve on a 2-D rhs ``B`` of shape (n, p). Returns (n, p)."""
    n, nb, nblk = plan.n, plan.nb, plan.nblk
    n_pad = nblk * nb
    p = B.shape[1]
    dtype = B.dtype
    K = plan.ell_cols.shape[-1]

    D = jnp.zeros((nblk, nb, nb), dtype)
    D = D.at[as_device_array(plan.diag_bi), as_device_array(plan.diag_ri), as_device_array(plan.diag_ci)].add(
        jnp.take(data, as_device_array(plan.diag_sel)) if len(plan.diag_sel)
        else jnp.zeros((0,), dtype))
    if not unit:
        # unit diagonal for the padded rows of the last block (in-graph,
        # avoids a (nblk, nb, nb) constant)
        first_pad = n - (nblk - 1) * nb
        ri = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        eye_pad = jnp.where((ri == ci) & (ri >= first_pad), 1.0, 0.0)
        D = D.at[nblk - 1].add(eye_pad.astype(dtype))
    # take with an inverse-gather VJP (the default scatter-add cotangent
    # costs ~25 ms per 3M entries on v5e; the inverse gather is ~1 ms)
    vals = plan.val_gather(data).astype(dtype)
    # pad, not .at[:n].set: the basic-slice scatter's empty dynamic-index
    # tuple becomes a (0,) int32 host constant that
    # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS=1 hoists as a const arg and then
    # rejects ("TypedNdArray has no attribute sharding", jax 0.9.0)
    Bp = jnp.pad(B, ((0, n_pad - n), (0, 0)))
    B_blocks = Bp.reshape(nblk, nb, p)
    cols_xs = as_device_array(plan.ell_cols)
    offs = jnp.arange(nblk, dtype=jnp.int32) * nb

    # Invert every diagonal block ONCE as a batched (parallel) triangular
    # solve, so the sequential scan does a plain (nb, nb) @ (nb, p) matmul
    # per step instead of a trsm (measured ~2x cheaper per step on TPU).
    eye = jnp.eye(nb, dtype=dtype)
    if unit:
        D = D + eye  # implicit unit diagonal made explicit for inversion
    D_tri = jnp.where(
        jnp.tril(jnp.ones((nb, nb), bool)) if lower
        else jnp.triu(jnp.ones((nb, nb), bool)), D, 0.0)
    Dinv = jax.scipy.linalg.solve_triangular(
        D_tri, jnp.broadcast_to(eye, (nblk, nb, nb)), lower=lower)

    def step(x, inp):
        off_i, Dinv_i, vals_i, cols_i, B_i = inp
        g = jnp.take(x, cols_i.reshape(-1), axis=0).reshape(nb, K, p)
        contrib = jnp.einsum("rk,rkp->rp", vals_i, g)
        xb = Dinv_i @ (B_i - contrib)
        # pin the literal index dtype: under x64 a python 0 weak-promotes
        # to int64 and dynamic_update_slice rejects mixed index dtypes
        x = jax.lax.dynamic_update_slice(x, xb,
                                         (off_i, jnp.zeros((), off_i.dtype)))
        return x, None

    x0 = jnp.zeros((n_pad, p), dtype)
    xs = (offs, Dinv, vals, cols_xs, B_blocks)
    x, _ = jax.lax.scan(step, x0, xs, reverse=not lower)
    return x[:n]


# --------------------------------------------------------------------------
# level-scheduled wave solve
# --------------------------------------------------------------------------

BENES_TABLE_MIN = 1 << 17     # crossover: see kernels/shuffle.BENES_MIN_N


def _make_val_gather(sel: np.ndarray, nnz: int):
    """``take(data_ext, sel)`` whose VJP is a pure inverse gather.

    Each data entry occupies at most one table slot, so the cotangent is
    ``d_data[e] = ct_flat[pos(e)]`` — one static gather instead of XLA's
    default scatter-add over the (much larger) table (measured ~25 ms per
    3M-entry scatter on v5e; the gather is ~1 ms).

    Large tables on TPU route through the Beneš exchange network
    (``kernels/benes.py``) instead of the flat take: the per-scalar
    gather costs one HBM transaction per TABLE SLOT (measured 35 ms for
    the 5.3M-slot cfd2-factor ELL table at nb=128 — the dominant term of
    the round-4 triangular-solve backward), while the network streams.
    ``TSGU_TRI_BENES=0`` restores the flat take for A/B runs."""
    flat = sel.reshape(-1).astype(np.int64)
    pos = np.full(nnz + 1, flat.size, np.int64)
    pos[flat] = np.arange(flat.size)
    inv_pos = pos[:nnz].astype(np.int32)
    shape = sel.shape
    sel_sa = StaticArray(np.ascontiguousarray(sel))

    def _benes_ok(dtype) -> bool:
        from ..kernels import benes, dispatch
        return (os.environ.get("TSGU_TRI_BENES", "1") == "1"
                and dispatch.on_tpu() and flat.size >= BENES_TABLE_MIN
                and dtype in (jnp.float32, jnp.bfloat16)
                and benes.has_gather_plan(sel_sa, nnz))

    @jax.custom_vjp
    def f(data):
        if _benes_ok(data.dtype):
            from ..kernels import benes
            return benes.benes_gather(sel_sa, nnz, data)
        ext = jnp.concatenate([data, jnp.zeros((1,), data.dtype)])
        return jnp.take(ext, as_device_array(sel).reshape(-1)
                        ).reshape(shape)

    def fwd(data):
        return f(data), None

    def bwd(_, ct):
        if _benes_ok(ct.dtype):
            from ..kernels import benes
            return (benes.benes_gather_t(sel_sa, nnz, ct),)
        flat_ct = jnp.concatenate([ct.reshape(-1),
                                   jnp.zeros((1,), ct.dtype)])
        return (jnp.take(flat_ct, as_device_array(inv_pos)),)

    f.defvjp(fwd, bwd)
    return f


@dataclass(frozen=True, eq=False)  # id-hash: ndarray fields
class _WavePlan:
    """Level-scheduled solve schedule (see ``_build_wave_plan``)."""
    n: int
    nb: int
    gcap: int
    S: int
    W: int
    P_n: int
    perm: np.ndarray       # (n,) permuted position -> original row
    rank: np.ndarray       # (n,) original row -> permuted position
    offs: np.ndarray       # (S,) slab start row per step
    diag_sel: np.ndarray   # in-block entries: data index + scatter coords
    diag_si: np.ndarray
    diag_gi: np.ndarray
    diag_ri: np.ndarray
    diag_ci: np.ndarray
    pad_mask: np.ndarray   # (S, gcap, nb) rows with no real diagonal
    ell_sel: np.ndarray    # (S, W, K1) cross-block entry -> data index
    ell_cols: np.ndarray   # (S, W, K1) permuted source row
    val_gather: object
    nnz: int
    # overflow tier: rows with more than K1 cross-block entries keep the
    # excess here, scatter-added at their recorded slab positions
    ov_pos: np.ndarray = None    # (S, Wov) slab-local row (W = pad row)
    ov_sel: np.ndarray = None    # (S, Wov, K2)
    ov_cols: np.ndarray = None   # (S, Wov, K2)
    ov_val_gather: object = None


@lru_cache(maxsize=64)
def _build_wave_plan(rows_sa: StaticArray, cols_sa: StaticArray, n: int,
                     nb: int, lower: bool, gcap: int = 8,
                     kpct: float = 99.0) -> _WavePlan:
    """Level-scheduled wavefront schedule for an unstructured triangular
    solve (SURVEY §7 hard-part 1; the reference leans on cuSPARSE's
    analysis phase instead, sparse_solve.py:176-184).

    Rows are permuted into dependency-level order (levels from the native
    ``tri_levels`` scan — rows of one level are mutually independent), the
    permuted rows are cut into ``nb``-row blocks, and consecutive blocks
    with no cross-block dependency among them are packed into one scan
    step of up to ``gcap`` blocks (dependencies *within* a block are
    absorbed by that block's dense triangular inverse).  On the cfd2-scale
    uniform-random factor this turns 965 sequential 128-row steps into
    ~130 slab steps — the sequential depth becomes the level depth, not
    ``n/nb``.  Upper-triangular input is flipped to lower form for the
    level computation; the permuted system is always block-lower.

    Steps write fixed ``gcap*nb`` slabs: a step whose run is shorter
    spills into the NEXT steps' rows, which their owners overwrite before
    any reader uses them (blocks are processed in order and dependencies
    only point to earlier steps) — so no masking is needed."""
    from ..native import tri_levels

    rows = rows_sa.arr.astype(np.int64).reshape(-1)
    cols = cols_sa.arr.astype(np.int64).reshape(-1)
    nnz = len(rows)
    strict = (cols < rows) if lower else (cols > rows)
    r_s, c_s = rows[strict], cols[strict]
    if lower:
        lev = tri_levels(r_s, c_s, n)
    else:
        # flip to lower form; reversing keeps the rows ascending
        lev = tri_levels((n - 1 - r_s)[::-1], (n - 1 - c_s)[::-1], n)[::-1]
    perm = np.argsort(lev, kind="stable")
    rank = np.empty(n, np.int64)
    rank[perm] = np.arange(n)

    keep = strict | (rows == cols)
    e_idx = np.nonzero(keep)[0]
    r2 = rank[rows[e_idx]]
    c2 = rank[cols[e_idx]]
    nblk = -(-n // nb)
    br, bc = r2 // nb, c2 // nb
    cross = bc < br

    maxpred = np.full(nblk, -1, np.int64)
    if cross.any():
        np.maximum.at(maxpred, br[cross], bc[cross])
    steps = []
    b = 0
    while b < nblk:
        s0 = b
        while b < nblk and maxpred[b] < s0:
            b += 1
        b = max(b, s0 + 1)
        for t in range(s0, b, gcap):
            steps.append((t, min(gcap, b - t)))
    S = len(steps)
    W = gcap * nb
    start_blk = np.array([s0 for s0, _ in steps], np.int64)
    offs = (start_blk * nb).astype(np.int32)
    P_n = int(offs[-1]) + W
    step_of_blk = np.empty(nblk, np.int64)
    for si, (s0, g) in enumerate(steps):
        step_of_blk[s0:s0 + g] = si

    inb = ~cross
    diag_sel = e_idx[inb].astype(np.int32)
    rb = br[inb]
    d_si = step_of_blk[rb]
    diag_gi = (rb - start_blk[d_si]).astype(np.int32)
    diag_ri = (r2[inb] % nb).astype(np.int32)
    diag_ci = (c2[inb] % nb).astype(np.int32)

    ce = e_idx[cross]
    rc, cc = r2[cross], c2[cross]
    order = np.argsort(rc, kind="stable")
    ce, rc, cc = ce[order], rc[order], cc[order]
    counts = np.bincount(rc, minlength=nblk * nb)
    Kmax = max(int(counts.max()) if len(rc) else 0, 1)
    # two-level table: the base ELL width is ~the 99th-percentile degree
    # (padding a uniform table to the max degree wastes ~3x the gathered
    # rows — the solve is gather-transaction-bound on TPU); the few
    # heavier rows keep their excess in a small per-step overflow tier
    nzc = counts[counts > 0]
    K = Kmax
    if len(nzc) > 1024:
        K = max(1, min(Kmax, int(np.percentile(nzc, kpct)) + 1))
    starts_ = np.zeros(nblk * nb + 1, np.int64)
    np.cumsum(counts, out=starts_[1:])
    slot = np.arange(len(rc)) - starts_[rc]
    si_r = step_of_blk[rc // nb]
    sl = rc - offs.astype(np.int64)[si_r]
    base = slot < K
    ell_sel = np.full((S, W, K), nnz, np.int32)
    ell_cols = np.zeros((S, W, K), np.int32)
    ell_sel[si_r[base], sl[base], slot[base]] = ce[base]
    ell_cols[si_r[base], sl[base], slot[base]] = cc[base]

    ov_pos = ov_sel = ov_cols = ov_gather = None
    if K < Kmax:
        K2 = Kmax - K
        ovf = ~base
        # overflow rows per step, each with its slab position recorded
        ov_rows = np.unique(np.stack([si_r[ovf], sl[ovf]], 1), axis=0)
        wov_counts = np.bincount(ov_rows[:, 0], minlength=S)
        Wov = max(8, -(-int(wov_counts.max()) // 8) * 8)
        ov_slot_of = {}
        nxt = np.zeros(S, np.int64)
        ov_pos = np.full((S, Wov), W, np.int32)       # W -> pad row
        for s_i, sl_i in ov_rows:
            t = nxt[s_i]
            nxt[s_i] += 1
            ov_slot_of[(s_i, sl_i)] = t
            ov_pos[s_i, t] = sl_i
        ov_sel = np.full((S, Wov, K2), nnz, np.int32)
        ov_cols = np.zeros((S, Wov, K2), np.int32)
        for i in np.nonzero(ovf)[0]:
            t = ov_slot_of[(si_r[i], sl[i])]
            ov_sel[si_r[i], t, slot[i] - K] = ce[i]
            ov_cols[si_r[i], t, slot[i] - K] = cc[i]
        ov_gather = _make_val_gather(ov_sel, nnz)

    pad = np.ones((S, gcap, nb), bool)
    for si, (s0, g) in enumerate(steps):
        for gg in range(g):
            valid = min(nb, n - (s0 + gg) * nb)
            if valid > 0:
                pad[si, gg, :valid] = False

    return _WavePlan(n=n, nb=nb, gcap=gcap, S=S, W=W, P_n=P_n,
                     perm=perm, rank=rank, offs=offs,
                     diag_sel=diag_sel, diag_si=d_si.astype(np.int32),
                     diag_gi=diag_gi, diag_ri=diag_ri, diag_ci=diag_ci,
                     pad_mask=pad, ell_sel=ell_sel, ell_cols=ell_cols,
                     val_gather=_make_val_gather(ell_sel, nnz), nnz=nnz,
                     ov_pos=ov_pos, ov_sel=ov_sel, ov_cols=ov_cols,
                     ov_val_gather=ov_gather)


def _wave_tri_solve(plan: _WavePlan, data, B, *, unit: bool):
    """Core level-scheduled solve on a 2-D rhs ``B`` (n, p)."""
    S, gcap, nb, W = plan.S, plan.gcap, plan.nb, plan.W
    n, P_n = plan.n, plan.P_n
    p = B.shape[1]
    dtype = B.dtype
    K = plan.ell_cols.shape[-1]

    D = jnp.zeros((S, gcap, nb, nb), dtype)
    if len(plan.diag_sel):
        D = D.at[as_device_array(plan.diag_si),
                 as_device_array(plan.diag_gi),
                 as_device_array(plan.diag_ri),
                 as_device_array(plan.diag_ci)].add(
            jnp.take(data, as_device_array(plan.diag_sel)))
    eye = jnp.eye(nb, dtype=dtype)
    if unit:
        D = D + eye
    else:
        D = D + as_device_array(plan.pad_mask)[..., None] * eye
    tril = jnp.tril(jnp.ones((nb, nb), bool))
    D_tri = jnp.where(tril, D, 0.0)
    Dinv = jax.scipy.linalg.solve_triangular(
        D_tri.reshape(S * gcap, nb, nb),
        jnp.broadcast_to(eye, (S * gcap, nb, nb)),
        lower=True).reshape(S, gcap, nb, nb)

    vals = plan.val_gather(data).astype(dtype)          # (S, W, K)
    Bp = jnp.take(B, as_device_array(plan.perm), axis=0)
    Bp = jnp.concatenate(
        [Bp, jnp.zeros((P_n - n, p), dtype)], axis=0)
    cols_xs = as_device_array(plan.ell_cols)
    offs_xs = as_device_array(plan.offs)
    has_ov = plan.ov_sel is not None
    if has_ov:
        ov_vals = plan.ov_val_gather(data).astype(dtype)  # (S, Wov, K2)
        ov_cols_xs = as_device_array(plan.ov_cols)
        ov_pos_xs = as_device_array(plan.ov_pos)
        Wov, K2 = plan.ov_pos.shape[1], plan.ov_cols.shape[-1]

    def step(x, inp):
        if has_ov:
            off_s, Dinv_s, vals_s, cols_s, ovv_s, ovc_s, ovp_s = inp
        else:
            off_s, Dinv_s, vals_s, cols_s = inp
        zero = jnp.zeros((), off_s.dtype)
        B_s = jax.lax.dynamic_slice(Bp, (off_s, zero), (W, p))
        g = jnp.take(x, cols_s.reshape(-1), axis=0).reshape(W, K, p)
        contrib = jnp.einsum("rk,rkp->rp", vals_s, g)
        rhs = B_s - contrib
        if has_ov:
            gov = jnp.take(x, ovc_s.reshape(-1), axis=0).reshape(Wov, K2, p)
            ov = jnp.einsum("rk,rkp->rp", ovv_s, gov)
            rhs = jnp.concatenate(
                [rhs, jnp.zeros((1, p), dtype)], axis=0
            ).at[ovp_s].add(-ov)[:W]
        rhs = rhs.reshape(gcap, nb, p)
        xb = jnp.einsum("gij,gjp->gip", Dinv_s, rhs).reshape(W, p)
        return jax.lax.dynamic_update_slice(x, xb, (off_s, zero)), None

    x0 = jnp.zeros((P_n, p), dtype)
    xs = ((offs_xs, Dinv, vals, cols_xs, ov_vals, ov_cols_xs, ov_pos_xs)
          if has_ov else (offs_xs, Dinv, vals, cols_xs))
    x, _ = jax.lax.scan(step, x0, xs)
    return jnp.take(x, as_device_array(plan.rank), axis=0)


# --------------------------------------------------------------------------
# forward dispatch (2-D core)
# --------------------------------------------------------------------------

def _tri_dia_forward(A, B, *, upper: bool, unit: bool, transpose: bool):
    """Banded fast path: single-kernel rolling-window back-substitution
    (kernels/dia_tri.py).  Upper and transpose solves reduce to the lower
    core by grid-level shifts/flips — no value permutation.  Returns None
    when the pattern is not DIA / band too wide."""
    import numpy as np

    from ..kernels.dia import _transpose_grid, build_dia_plan, values_to_grid
    from ..kernels.dia_tri import tri_dia_core

    if B.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    rs, cs = A.row_sa(), A.col_sa()
    if rs is None or cs is None or rs.arr.ndim != 1:
        return None
    n = A.shape[0]
    dia = build_dia_plan(rs, cs, n, n)
    if dia is None or dia.is_hybrid:
        return None
    gridv = values_to_grid(dia, A.data)
    offsets = dia.offsets
    eff_upper = upper
    if transpose:
        offsets_T, shift = _transpose_grid(dia)
        gridv = shift(gridv)
        offsets = offsets_T
        eff_upper = not upper
    if eff_upper:
        # full index reversal turns upper into lower: grid flips on both
        # axes, offsets negate (and re-sort = reverse)
        gridv = gridv[::-1, ::-1]
        offsets = np.sort(-offsets)
        B = B[::-1]
    out = tri_dia_core(offsets, gridv, B, unit=unit)
    if out is None:
        return None
    return out[::-1] if eff_upper else out


def _tri_forward_2d(A, B, *, upper: bool, unit: bool, transpose: bool,
                    algorithm: str, block_size: Optional[int]):
    if algorithm in ("auto", "dia"):
        out = _tri_dia_forward(A, B, upper=upper, unit=unit,
                               transpose=transpose)
        if out is not None:
            return out
    if algorithm == "dia":
        raise ValueError(
            "sparse_triangular_solve: algorithm='dia' requires a "
            "diagonal-structured (banded) static pattern")
    swap = False
    if transpose:
        # Aᵀ x = B: solve with the flipped triangle on the transposed
        # pattern.  Static patterns do this WITHOUT materialising A.T —
        # the scheduling plans below are built from per-entry (row, col)
        # index arrays, so swapping the two arrays host-side makes every
        # plan table (diag scatter, ELL value gather) index the ORIGINAL
        # data directly.  The old ``A.T`` route paid a runtime CSC value
        # permutation (~20 ms at 1.5M nnz on v5e) on every backward pass
        # of the non-transpose solve; the composed plan pays nothing.
        static = A.pattern_static or not isinstance(
            A.rows() if isinstance(A, SparseCOO) else A.indptr_arr(),
            jax.core.Tracer)
        if algorithm == "dense" or not static:
            return _tri_forward_2d(A.T, B, upper=not upper, unit=unit,
                                   transpose=False, algorithm=algorithm,
                                   block_size=block_size)
        swap = True
        upper = not upper
    n = A.shape[0]
    use_dense = algorithm == "dense" or not (
        A.pattern_static or not isinstance(
            A.rows() if isinstance(A, SparseCOO) else A.indptr_arr(),
            jax.core.Tracer))
    if algorithm not in ("auto", "dense", "block", "wave", "dia"):
        raise ValueError(f"unknown algorithm {algorithm!r}; expected "
                         "'auto', 'dia', 'wave', 'block' or 'dense'")
    if use_dense:
        # NOTE: dynamic patterns take this dense fallback for EVERY
        # algorithm, including 'wave' and 'block' — scheduling needs the
        # pattern on the host.
        if algorithm != "dense" and n > 2048:
            warnings.warn(
                "sparse_triangular_solve: dynamic-pattern input falls back "
                "to a densified solve (O(n^2) memory)", UserWarning)
        Ad = A.todense()
        return jax.scipy.linalg.solve_triangular(
            Ad, B, lower=not upper, unit_diagonal=unit)
    if algorithm == "wave" and n <= 256:
        # nothing to schedule at this size (a single <=256-row block);
        # raise rather than silently running the blocked path, matching
        # the algorithm='dia' contract
        raise ValueError(
            "sparse_triangular_solve: algorithm='wave' needs n > 256 "
            "(below that the blocked scan is a single step; use "
            "algorithm='block' or 'auto')")
    # Default block size: the scan is gather-throughput + per-step-latency
    # bound (measured ~34 us/step at nb=128, cfd2-factor scale), so larger
    # blocks amortise the sequential chain; the (nblk, nb, nb) batched
    # block-inverse stays cheap on the MXU (~16 GFLOP at nb=512).
    if block_size:
        nb = block_size
    elif n >= 16384:
        nb = 512
    else:
        nb = min(128, max(8, 1 << (n - 1).bit_length() if n < 128 else 128))
    rows = StaticArray(np.asarray(A.cols_np() if swap else A.rows_np()))
    cols = StaticArray(np.asarray(A.rows_np() if swap else A.cols_np()))
    if algorithm in ("auto", "wave") and n > 256:
        # level-scheduled wavefront: sequential depth = dependency-level
        # depth, not n/nb.  Worth it when packing shortens the chain
        # meaningfully vs the plain blocked scan (banded/near-sequential
        # patterns pack poorly and stay on the blocked path).
        wnb = min(block_size or 128, 128)
        # TSGU_WAVE_KPCT tunes the wave plan's base/overflow ELL split:
        # the padded base table gathers S*W*K rows total, so every
        # percentile point of width is ~W*S wasted gather transactions;
        # the sweet spot is a hardware question
        # (benchmarks/probe_tri.py sweeps it).
        kpct = float(os.environ.get("TSGU_WAVE_KPCT", "99.0"))
        blocked_steps = -(-n // nb)
        # measured on v5e (cfd2-scale random factor): the solve is
        # gather-bound, not step-latency-bound — wave's 7.4x step cut
        # (965 -> 130) gained nothing (26.1 vs 24.3 ms fwd) because its
        # padded ELL base amplifies the gathered bytes.  auto therefore
        # packs only when (a) the dependency chain is much shallower than
        # the blocked scan (TSGU_WAVE_GATE x blocked steps), or (b) the
        # row degrees are skewed: the blocked plan's full-max ELL table
        # pads every row to the max degree, so a transposed random factor
        # (column degrees ~ 1/j: max 10-20x the p99) amplifies the value
        # gather by the same factor, while the wave plan's p99 base +
        # overflow tier absorbs the tail.  Skew gate: TSGU_TRI_SKEW.
        gate = float(os.environ.get("TSGU_WAVE_GATE", "0.25"))
        use_wave = algorithm == "wave"
        if not use_wave:
            skew_gate = float(os.environ.get("TSGU_TRI_SKEW", "4.0"))
            off = (cols.arr < rows.arr) if not upper else (cols.arr
                                                           > rows.arr)
            deg = np.bincount(rows.arr[off], minlength=n)
            kmax = int(deg.max(initial=0))
            kp99 = int(np.percentile(deg, 99.0)) if n else 0
            use_wave = kmax > skew_gate * max(kp99, 1)
        if not use_wave:
            wplan = _build_wave_plan(rows, cols, n, wnb, not upper,
                                     kpct=kpct)
            use_wave = wplan.S <= gate * blocked_steps
        if use_wave:
            wplan = _build_wave_plan(rows, cols, n, wnb, not upper,
                                     kpct=kpct)
            return _wave_tri_solve(wplan, A.data, B, unit=unit)
    plan = _build_tri_plan(rows, cols, n, nb, not upper)
    return _blocked_tri_solve(plan, A.data, B, lower=not upper, unit=unit)


# --------------------------------------------------------------------------
# custom VJP
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _tri_cv(upper: bool, unit: bool, transpose: bool, algorithm: str,
            block_size: Optional[int]):
    @jax.custom_vjp
    def f(A, B):
        return _tri_forward_2d(A, B, upper=upper, unit=unit,
                               transpose=transpose, algorithm=algorithm,
                               block_size=block_size)

    def fwd(A, B):
        x = f(A, B)
        return x, (A, x)

    def bwd(res, g):
        A, x = res
        gradB = _tri_cv(upper, unit, not transpose, algorithm,
                        block_size)(A, g)
        # non-transpose: gradA[i,j] = -dot(gradB[i,:], x[j,:])
        # transpose:     gradA[i,j] = -dot(x[i,:], gradB[j,:])
        if transpose:
            vals = -sddmm(A, x, gradB).data
        else:
            vals = -sddmm(A, gradB, x).data
        return sparse_cotangent(A, vals), gradB

    f.defvjp(fwd, bwd)
    return f


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------

def _has_explicit_diag(A) -> bool:
    try:
        r = A.rows_np()
        c = A.cols_np()
    except ValueError:
        return False  # dynamic pattern: cannot check eagerly
    return bool((r == c).any())


def sparse_triangular_solve(A: Union[SparseCOO, SparseCSR], B, *,
                            upper: bool = True,
                            unitriangular: bool = False,
                            transpose: bool = False,
                            algorithm: str = "auto",
                            block_size: Optional[int] = None):
    """Solve ``A x = B`` (or ``Aᵀ x = B``) for sparse triangular ``A``.

    Args:
      A: ``(n, n)`` or batched ``(b, n, n)`` sparse triangular container.
      B: dense ``(n,)``, ``(n, p)`` or batched ``(b, n, p)``.
      upper: whether A is upper triangular (default True, matching the
        reference, sparse_solve.py:9).
      unitriangular: A has an implicit unit diagonal; the pattern must not
        contain explicit diagonal entries (reference raises in the backward,
        sparse_solve.py:232-233 — here the static pattern is checked
        eagerly).
      transpose: solve ``Aᵀ x = B`` instead.
      algorithm: "auto" | "dia" (single-kernel rolling-window solve for
        banded patterns; auto prefers it) | "wave" (level-scheduled
        wavefront for unstructured patterns, n > 256; auto takes it when
        the dependency-level packing shortens the sequential chain) |
        "block" (scan of blocked back-substitution steps) | "dense".
      block_size: row-block size for the block algorithm (default ≤128).

    Gradients w.r.t. A are returned only at its stored nonzeros.
    """
    if not is_sparse(A):
        raise TypeError(
            "sparse_triangular_solve: A must be SparseCOO/SparseCSR")
    if is_sparse(B):
        raise TypeError("sparse_triangular_solve: B must be a dense array")
    B = B if isinstance(B, jax.core.Tracer) else jnp.asarray(B)
    if A.ndim not in (2, 3):
        raise ValueError("sparse_triangular_solve: A must be 2-D or "
                         "batched 3-D")
    if A.shape[-1] != A.shape[-2]:
        raise ValueError("sparse_triangular_solve: A must be square")
    if A.dtype != B.dtype:
        raise ValueError(
            f"sparse_triangular_solve: dtype mismatch, A is {A.dtype} and "
            f"B is {B.dtype}")
    if unitriangular and _has_explicit_diag(A):
        raise ValueError(
            "sparse_triangular_solve: unitriangular=True requires a pattern "
            "without explicit diagonal entries")

    f = _tri_cv(upper, unitriangular, transpose, algorithm, block_size)

    if A.ndim == 2:
        if B.ndim == 1:
            if B.shape[0] != A.shape[0]:
                raise ValueError(
                    f"sparse_triangular_solve: incompatible shapes "
                    f"A {A.shape} vs B {B.shape}")
            return f(A, B[:, None])[:, 0]
        if B.ndim == 2:
            if B.shape[0] != A.shape[0]:
                raise ValueError(
                    f"sparse_triangular_solve: incompatible shapes "
                    f"A {A.shape} vs B {B.shape}")
            return f(A, B)
        if B.ndim == 3:
            return jax.vmap(lambda b: f(A, b))(B)
        raise ValueError("sparse_triangular_solve: B must be 1-D, 2-D or "
                         "3-D")
    # batched A
    if B.ndim == 2:
        B = jnp.broadcast_to(B, (A.shape[0],) + B.shape)
    if B.ndim != 3 or B.shape[0] != A.shape[0]:
        raise ValueError(
            f"sparse_triangular_solve: incompatible batch shapes A "
            f"{A.shape} vs B {B.shape}")
    if B.shape[1] != A.shape[-1]:
        raise ValueError(
            f"sparse_triangular_solve: incompatible shapes A {A.shape} vs "
            f"B {B.shape}")
    if not A.indices_batched():
        # shared pattern: one plan, vmap over (data, B)
        A2 = _batch_elem(A, None)
        return jax.vmap(lambda d, b: f(A2.with_data(d), b))(A.data, B)
    outs = [f(_batch_elem(A, i), B[i]) for i in range(A.shape[0])]
    return jnp.stack(outs)


def _batch_elem(A, i: Optional[int]):
    """2-D view of batch element i (or of the shared pattern, i=None)."""
    if isinstance(A, SparseCOO):
        r = A.rows_np("batched triangular solve")
        c = A.cols_np("batched triangular solve")
        if i is not None and r.ndim > 1:
            r, c = r[i], c[i]
        data = A.data[i] if i is not None else A.data[0]
        return SparseCOO(r, c, data, A.shape[-2:],
                         pattern_static=A.pattern_static)
    ip = A.indptr_np("batched triangular solve")
    ix = A.cols_np("batched triangular solve")
    if i is not None and ip.ndim > 1:
        ip, ix = ip[i], ix[i]
    data = A.data[i] if i is not None else A.data[0]
    return SparseCSR(ip, ix, data, A.shape[-2:],
                     pattern_static=A.pattern_static)
