"""ELL-grid logsumexp: generic static patterns at streaming speed.

The round-2 chunk-LSE kernel expands every entry into a ``(W, C)``
one-hot column on the VPU — ~32x redundant work per nonzero plus ~3 µs of
grid-step overhead per 8 chunks, which put the random-pattern row-LSE at
~5-9 ms for a 12 MB value stream.  This path removes both costs:

1. the values are relayed once into a padded row-ELL grid ``(n, K)``
   (``K`` = max row degree).  The fill map ``row*K + slot`` is strictly
   increasing in CSR entry order — a *monotone* relayout, so it rides the
   :mod:`.window_gather` kernel at ~1-2 ms / 3M nnz instead of a ~25 ms
   XLA scalar scatter;
2. the row reduction is then a plain fused dense reduce over the grid's
   minor axis (masked max / exp / sum — XLA fuses it into ~2 passes over
   ``n*K`` floats at HBM stream speed).

The backward reuses the same grid: ``d_grid = exp(v - out[row]) * g[row]``
broadcast over ``(n, K)``, compacted back to ``(nnz,)`` through the
differentiable inverse relayout.

Gate: ``n*K <= GRID_MAX_EXPAND * nnz`` (degree-skewed patterns fall back
to the chunk kernel / XLA segment path).

Reference counterpart: ``_scatter_logsumexp`` / ``_logsumexp_2d``
(/root/reference/torchsparsegradutils/sparse_logsumexp.py:10-138) — same
max-shift semantics (detached shift, ``include_zeros`` mass, empty-group
-inf, +inf passthrough), different execution shape (grid streams instead
of scatter kernels).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import StaticArray, as_device_array
from .window_gather import build_window_plan, window_gather, window_gather_xla

GRID_MAX_EXPAND = 8.0
NEG_INF = float("-inf")


@dataclass(frozen=True, eq=False)  # id-hash: ndarray fields, vjp nondiff arg
class EllGridPlan:
    """Row-ELL value-grid plan.  Attribute names match ``DiaPlan`` so the
    shared differentiable relayouts (``dia.values_to_grid`` /
    ``grid_to_values``) apply unchanged."""
    n: int
    m: int
    nnz: int
    K: int
    counts: np.ndarray        # (n,) row degrees
    src_of_grid: np.ndarray   # (n*K,) entry index per grid cell, -1 = hole
    pos: np.ndarray           # (nnz,) grid cell per entry (monotone)
    fill_plan: object         # WindowPlan or None
    unfill_plan: object


@lru_cache(maxsize=256)
def build_ell_grid_plan(rows_sa: StaticArray, cols_sa: StaticArray, n: int,
                        m: int) -> Optional[EllGridPlan]:
    rows = rows_sa.arr.astype(np.int64)
    if rows.ndim != 1 or len(rows) == 0:
        return None
    nnz = len(rows)
    if nnz > 1 and (np.diff(rows) < 0).any():
        return None  # not canonical row-sorted order
    counts = np.bincount(rows, minlength=n)
    K = max(int(counts.max()), 1)
    if n * K > GRID_MAX_EXPAND * nnz:
        return None
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(nnz) - starts[rows]
    pos = rows * K + slot                       # strictly increasing
    src_of_grid = np.full(n * K, -1, np.int64)
    src_of_grid[pos] = np.arange(nnz)
    fill_plan = build_window_plan(src_of_grid, n * K, nnz)
    unfill_plan = build_window_plan(pos, nnz, n * K)
    return EllGridPlan(n=n, m=m, nnz=nnz, K=K, counts=counts,
                       src_of_grid=src_of_grid, pos=pos,
                       fill_plan=fill_plan, unfill_plan=unfill_plan)


UNROLL_K_MAX = 64


def masked_lse_kn(XT, validT, counts, width: int, include_zeros: bool):
    """Masked LSE over axis 0 of a ``(K, n)`` value grid.

    The grids are built ``(n, K)`` (row-major fill order), but reducing
    over a short non-lane-aligned minor axis makes XLA relayout every
    pass (measured 5-8 ms for a 12 MB stream on v5e); transposed to
    ``(K, n)`` the same reduction is K-1 fused elementwise maxima over
    clean ``(n,)`` vectors and runs at stream speed.  Semantics match the
    reference ``_scatter_logsumexp`` (sparse_logsumexp.py:10-73): empty
    groups -> -inf, structural zeros contribute ``exp(0)`` when
    ``include_zeros``, +inf passes through, max-shift detached.

    XT: (K, n) values; validT: (K, n) bool (static); counts: (n,) stored
    entries per group; width: group size in the reduced direction.
    """
    K = XT.shape[0]
    if K <= UNROLL_K_MAX:
        Mv = jnp.where(validT[0], XT[0], NEG_INF)
        for k in range(1, K):
            Mv = jnp.maximum(Mv, jnp.where(validT[k], XT[k], NEG_INF))
    else:
        Mv = jnp.max(jnp.where(validT, XT, NEG_INF), axis=0)
    nz = width - counts                       # structural zeros per group
    if include_zeros:
        M = jnp.where(nz > 0, jnp.maximum(Mv, 0.0), Mv)
    else:
        M = Mv
    Ms = jax.lax.stop_gradient(jnp.where(jnp.isfinite(M), M, 0.0))
    if K <= UNROLL_K_MAX:
        S = jnp.where(validT[0], jnp.exp(XT[0] - Ms), 0.0)
        for k in range(1, K):
            S = S + jnp.where(validT[k], jnp.exp(XT[k] - Ms), 0.0)
    else:
        S = jnp.where(validT, jnp.exp(XT - Ms[None, :]), 0.0).sum(axis=0)
    if include_zeros:
        S = S + jnp.where(nz > 0, nz.astype(S.dtype) * jnp.exp(-Ms), 0.0)
    empty = S == 0.0
    out = jnp.where(empty, NEG_INF,
                    Ms + jnp.log(jnp.where(empty, 1.0, S)))
    return jnp.where(Mv == jnp.inf, jnp.inf, out)


_VALIDT_CACHE: dict = {}


def _grid_row_lse(plan: EllGridPlan, grid, include_zeros: bool):
    """Masked row-LSE over the (n, K) grid; same semantics as
    ``dia._dia_lse``'s reduce."""
    # per-plan cache: a fresh numpy mask every trace would inline an
    # (K, n) literal into the HLO (see as_device_array)
    hit = _VALIDT_CACHE.get(id(plan))
    if hit is None or hit[0] is not plan:
        validT = as_device_array(
            (plan.src_of_grid >= 0).reshape(plan.n, plan.K).T.copy())
        _VALIDT_CACHE[id(plan)] = (plan, validT)
    else:
        validT = hit[1]
    cnt = as_device_array(plan.counts)
    return masked_lse_kn(grid.T, validT, cnt, plan.m, include_zeros)


@lru_cache(maxsize=256)
def bidir_grid_fns(rows_sa: StaticArray, cols_sa: StaticArray, n: int,
                   m: int, include_zeros: bool):
    """Fused bidirectional LSE over one pattern: returns ``f(data) ->
    (col_lse, row_lse)`` or None when either direction's ELL grid is out
    of scope.

    One traversal in the reference sense (sparse_logsumexp.py:175-243:
    stacked scatter indices, one shared kernel): here ONE value
    permutation (CSR->CSC through the Beneš network), both ELL grid
    fills, and a single stacked masked reduce over ``(Kmax, n+m)`` — so
    the pair costs one reduce pass + one fill more than a lone row-LSE,
    instead of two independent calls' everything.  The stacked reduce is
    skipped (two in-program reduces instead) when the two grids' K
    differ enough that lane padding would outweigh the fusion.
    """
    from .. import native
    from .shuffle import permute_values
    rows = rows_sa.arr.astype(np.int64)
    cols = cols_sa.arr.astype(np.int64)
    if rows.ndim != 1 or len(rows) == 0:
        return None
    plan_r = build_ell_grid_plan(rows_sa, cols_sa, n, m)
    if plan_r is None:
        return None
    perm = native.lexsort_rowcol(cols, rows, n)
    rt = StaticArray(np.ascontiguousarray(cols[perm]))
    ct = StaticArray(np.ascontiguousarray(rows[perm]))
    plan_c = build_ell_grid_plan(rt, ct, m, n)
    if plan_c is None:
        return None
    perm_sa = StaticArray(np.ascontiguousarray(perm.astype(np.int64)))
    inv_sa = StaticArray(np.ascontiguousarray(
        np.argsort(perm).astype(np.int64)))
    Kr, Kc = plan_r.K, plan_c.K
    Kmax = max(Kr, Kc)
    stack = Kmax * (plan_r.n + plan_c.n) <= 1.3 * (Kr * plan_r.n
                                                   + Kc * plan_c.n)
    validT_r = (plan_r.src_of_grid >= 0).reshape(plan_r.n, Kr).T
    validT_c = (plan_c.src_of_grid >= 0).reshape(plan_c.n, Kc).T
    if stack:
        vT = np.zeros((Kmax, plan_c.n + plan_r.n), bool)
        vT[:Kc, :plan_c.n] = validT_c
        vT[:Kr, plan_c.n:] = validT_r
        validT_dev = as_device_array(vT)
        cnt_dev = as_device_array(
            np.concatenate([plan_c.counts, plan_r.counts]))
        width_dev = as_device_array(np.concatenate(
            [np.full(plan_c.n, plan_c.m, np.int64),
             np.full(plan_r.n, plan_r.m, np.int64)]))
    else:
        validT_c_dev = as_device_array(validT_c.copy())
        validT_r_dev = as_device_array(validT_r.copy())

    from .dia import values_to_grid

    def _grids(data):
        gr = values_to_grid(plan_r, data).astype(data.dtype)
        gc = values_to_grid(
            plan_c, permute_values(perm_sa, data)).astype(data.dtype)
        return gr, gc

    def _reduce(gr, gc):
        if stack:
            XT = jnp.concatenate([
                jnp.pad(gc.T, ((0, Kmax - Kc), (0, 0))),
                jnp.pad(gr.T, ((0, Kmax - Kr), (0, 0)))], axis=1)
            out = masked_lse_kn(XT, validT_dev, cnt_dev, width_dev,
                                include_zeros)
            return out[:plan_c.n], out[plan_c.n:]
        col = masked_lse_kn(gc.T, validT_c_dev,
                            as_device_array(plan_c.counts), plan_c.m,
                            include_zeros)
        row = masked_lse_kn(gr.T, validT_r_dev,
                            as_device_array(plan_r.counts), plan_r.m,
                            include_zeros)
        return col, row

    from .dia import _use_pallas_grid

    def _unfill(plan, d_grid):
        flat = d_grid.reshape(-1)
        if plan.unfill_plan is not None and _use_pallas_grid(flat.dtype):
            return window_gather(plan.unfill_plan, flat)
        return window_gather_xla(plan.pos, flat, plan.nnz)

    @jax.custom_vjp
    def f(data):
        gr, gc = _grids(data)
        return _reduce(gr, gc)

    def fwd(data):
        out = f(data)
        return out, (data, out)

    def bwd(res, gs):
        data, (col, row) = res
        g_col, g_row = gs
        gr, gc = _grids(data)

        def part(grid, out, g):
            safe = jnp.isfinite(out)
            oute = jnp.where(safe, out, 0.0)
            ge = jnp.where(safe, g, 0.0)
            return (jnp.exp(grid.T - oute[None, :]) * ge[None, :]).T

        d_row = _unfill(plan_r, part(gr, row, g_row))
        d_csc = _unfill(plan_c, part(gc, col, g_col))
        return (d_row + permute_values(inv_sa, d_csc),)

    f.defvjp(fwd, bwd)
    return f


@lru_cache(maxsize=256)
def grid_lse_fn(rows_sa: StaticArray, cols_sa: StaticArray, n: int, m: int,
                include_zeros: bool):
    """Cached custom-vjp row-logsumexp over the ELL grid, or None."""
    plan = build_ell_grid_plan(rows_sa, cols_sa, n, m)
    if plan is None:
        return None
    from .dia import _use_pallas_grid

    def fill(data):
        from .dia import values_to_grid
        return values_to_grid(plan, data).astype(data.dtype)

    @jax.custom_vjp
    def f(data):
        return _grid_row_lse(plan, fill(data), include_zeros)

    def fwd(data):
        out = f(data)
        return out, (data, out)

    def bwd(res, g):
        data, out = res
        # d_v[e] = exp(v_e - out[row_e]) * g[row_e]; computed on the grid
        # (holes produce garbage that the inverse compaction drops).  The
        # broadcast/exponential runs in (K, n) layout — see masked_lse_kn.
        gridT = fill(data).T
        safe = jnp.isfinite(out)
        oute = jnp.where(safe, out, 0.0)
        ge = jnp.where(safe, g, 0.0)
        d_grid = (jnp.exp(gridT - oute[None, :]) * ge[None, :]).T
        flat = d_grid.reshape(-1)
        if plan.unfill_plan is not None and _use_pallas_grid(flat.dtype):
            d_data = window_gather(plan.unfill_plan, flat)
        else:
            d_data = window_gather_xla(plan.pos, flat, plan.nnz)
        return (d_data,)

    f.defvjp(fwd, bwd)
    return f
