"""Pallas TPU chunk kernels for SpMM / SDDMM (the hot path).

Design (validated on a v5e chip; see git history for the measurement
trail):  random per-nonzero scalar relayouts cost ~25-50 ms at cfd2 scale,
so the kernel consumes the nonzero stream **in its natural (row-sorted)
order** in fixed chunks of C entries — no per-call value relayout at all:

  * the data values arrive as contiguous ``(SB, C)`` blocks;
  * the dense operand rows are pre-gathered by XLA (``take``) into a
    ``(nnz_pad, p)`` stream consumed linearly by the kernel (XLA's gather
    pipelines far better feeding a linear consumer than standalone);
  * each chunk touches a small contiguous set of ≤W distinct rows, so the
    row reduction becomes a one-hot (W, C) matrix built on the VPU and a
    single MXU contraction ``M @ Pg → (W, p)`` per chunk;
  * per-chunk partials are combined by one cheap segment-sum over
    ``nchunks·W`` rows (vs nnz rows for the naive scatter-add).

Measured at cfd2 scale (N=123k, nnz=3.1M, p=128, f32 HIGHEST):
forward 18 ms and fused backward (gradA values + gradB) 59 ms, vs 60/98 ms
for gather+segment-sum XLA — and the backward shares one kernel pass that
emits both the SDDMM values and the ``V = val·G[row]`` rows that turn
``AᵀG`` into a second row-sum chunk pass (avoiding the transpose-value
permutation entirely).

The kernels run under ``interpret=True`` off-TPU so the unit-test suite
covers them on CPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import StaticArray, as_device_array

HI = jax.lax.Precision.HIGHEST
LANE = 128
VMEM_BUDGET = 6 * 1024 * 1024   # per-buffer-set bytes (double buffering x2)
MIN_NNZ_FOR_PALLAS = 1          # kernels are correct at any size; dispatch
#                                 policy lives in ops/spmm.py


def interpret_mode() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@dataclass(frozen=True)
class ChunkPlan:
    """Row-oriented chunk plan for entries sorted by row."""
    n: int                 # output rows
    m: int                 # gather-source rows (columns of A)
    nnz: int
    C: int                 # entries per chunk
    SB: int                # chunks per grid step
    nchunks: int           # padded to a multiple of SB
    W: int                 # max distinct rows per chunk (multiple of 8)
    lr: np.ndarray         # (nchunks, C) int32: rank of entry's row in chunk
    seg_rows: np.ndarray   # (nchunks, W) int32: global row per rank (pad: n)
    gather_idx: np.ndarray  # (nnz_pad,) int32: source row in B per entry
    perm: Optional[np.ndarray]  # (nnz,) entry order used (None = natural)

    @property
    def nnz_pad(self) -> int:
        return self.nchunks * self.C


def _geometry_candidates():
    """(SB, C candidates) — overridable via TSGU_CHUNK_SB / TSGU_CHUNK_C
    for on-hardware sweeps without code edits."""
    import os
    sb = int(os.environ.get("TSGU_CHUNK_SB", "8"))
    c_env = os.environ.get("TSGU_CHUNK_C")
    cs = ((int(c_env),) if c_env else (512, 256, 128))
    return sb, cs


def _build(rows: np.ndarray, cols: np.ndarray, n: int, m: int,
           perm: Optional[np.ndarray]) -> Optional[ChunkPlan]:
    nnz = len(rows)
    if nnz == 0:
        return None
    from .. import native
    SB, c_candidates = _geometry_candidates()
    for C in c_candidates:
        nchunks_raw = -(-nnz // C)
        nchunks = -(-nchunks_raw // SB) * SB
        nnz_pad = nchunks * C
        rows_p = np.concatenate([rows, np.full(nnz_pad - nnz, rows[-1],
                                               rows.dtype)])
        # per-chunk distinct-row ranks (rows sorted -> rank by first index);
        # native C++ path with numpy fallback
        ranked = native.chunk_ranks(rows_p, C, n, W_cap=C)
        if ranked is None:
            continue
        lr, seg_full, W_true = ranked
        W = -(-W_true // 8) * 8
        # VMEM estimate: pg + gw/V + out per grid step
        step_bytes = SB * C * LANE * 4 * 2 + SB * W * LANE * 4
        if step_bytes <= VMEM_BUDGET:
            seg_rows = np.ascontiguousarray(seg_full[:, :W])
            cols_p = np.concatenate([cols, np.zeros(nnz_pad - nnz,
                                                    cols.dtype)])
            return ChunkPlan(n=n, m=m, nnz=nnz, C=C, SB=SB,
                             nchunks=nchunks, W=W, lr=lr,
                             seg_rows=seg_rows,
                             gather_idx=cols_p.astype(np.int32), perm=perm)
    return None


@lru_cache(maxsize=256)
def build_chunk_plan(rows_sa: StaticArray, cols_sa: StaticArray, n: int,
                     m: int) -> Optional[ChunkPlan]:
    """Plan over entries in natural order (requires row-sorted rows)."""
    rows = rows_sa.arr.astype(np.int64)
    cols = cols_sa.arr.astype(np.int64)
    if rows.ndim != 1 or len(rows) == 0:
        return None
    if not (np.diff(rows) >= 0).all():
        return None  # unsorted entry order: XLA fallback
    return _build(rows, cols, n, m, None)


@lru_cache(maxsize=256)
def build_chunk_plan_transpose(rows_sa: StaticArray, cols_sa: StaticArray,
                               n: int, m: int) -> Optional[ChunkPlan]:
    """Plan for Aᵀ: entries re-sorted by column; ``perm`` records the
    entry order so per-entry streams (e.g. the V matrix) can be gathered."""
    rows = rows_sa.arr.astype(np.int64)
    cols = cols_sa.arr.astype(np.int64)
    if rows.ndim != 1 or len(rows) == 0:
        return None
    from .. import native
    perm = native.lexsort_rowcol(cols, rows, n).astype(np.int64)
    return _build(cols[perm], rows[perm], m, n, perm.astype(np.int32))


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


_PERM_SA = {}


def _permute_plan_values(plan: ChunkPlan, data):
    """Reorder values into the plan's entry order (e.g. CSR->CSC for a
    transpose plan).  Routes through :func:`..kernels.shuffle
    .permute_values` so large TPU reorders ride the Bene\u0161 exchange
    network (~1.6 ms at 3M f32 on v5e, round-5 probe) instead of the
    ~21 ms per-scalar flat gather, with the inverse permutation as VJP."""
    key = id(plan)
    hit = _PERM_SA.get(key)
    if hit is None or hit[0] is not plan:
        from ..types import StaticArray
        sa = StaticArray(np.ascontiguousarray(plan.perm.astype(np.int64)))
        _PERM_SA[key] = (plan, sa)
    else:
        sa = hit[1]
    from .shuffle import permute_values
    return permute_values(sa, data)


def _pad_entries(x, plan: ChunkPlan):
    pad = plan.nnz_pad - plan.nnz
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x


def _pad_cols(X):
    p = X.shape[1]
    p_pad = -(-p // LANE) * LANE
    if p_pad != p:
        X = jnp.pad(X, ((0, 0), (0, p_pad - p)))
    return X, p


def _grid_specs(plan: ChunkPlan, p_pad: int):
    SB, C, W = plan.SB, plan.C, plan.W
    grid = (plan.nchunks // SB, p_pad // LANE)
    lr_spec = pl.BlockSpec((SB, C), lambda s, j: (s, 0),
                           memory_space=pltpu.VMEM)
    vals_spec = pl.BlockSpec((SB, C), lambda s, j: (s, 0),
                             memory_space=pltpu.VMEM)
    pg_spec = pl.BlockSpec((SB * C, LANE), lambda s, j: (s, j),
                           memory_space=pltpu.VMEM)
    gw_spec = pl.BlockSpec((SB, W, LANE), lambda s, j: (s, 0, j),
                           memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((SB, W, LANE), lambda s, j: (s, 0, j),
                             memory_space=pltpu.VMEM)
    return grid, lr_spec, vals_spec, pg_spec, gw_spec, part_spec


def _combine(plan: ChunkPlan, partial_out, p: int):
    seg = as_device_array(plan.seg_rows).reshape(-1)
    out = jax.ops.segment_sum(
        partial_out.reshape(-1, partial_out.shape[-1]), seg,
        num_segments=plan.n + 1)
    return out[:plan.n, :p]


def chunk_gather(plan: ChunkPlan, B):
    """The entry-order gather of B rows (the forward's main HBM traffic);
    reusable as a backward residual."""
    Bp, _ = _pad_cols(B)
    return jnp.take(Bp, as_device_array(plan.gather_idx), axis=0)


def chunk_spmm(plan: ChunkPlan, data, B, pg=None):
    """A @ B where A's entries follow the plan's order; B is (m, p).
    ``pg`` may supply a precomputed :func:`chunk_gather` result.

    bf16 inputs: the B-row gather (the dominant HBM traffic) runs at
    bf16 — the storage fast path, ~2.4x lower gather floor (probe
    gather_bf16) — while the per-entry value tiles and row partials stay
    f32: a bf16 ``(SB, C)`` / ``(SB, W, ·)`` block violates Mosaic's
    16-sublane tiling, and f32 partials keep the cross-chunk
    accumulation exact."""
    SB, C, W = plan.SB, plan.C, plan.W
    if plan.perm is not None:
        data = _permute_plan_values(plan, data)
    vals = _pad_entries(data, plan).reshape(plan.nchunks, C).astype(
        jnp.float32)
    Bp, p = _pad_cols(B)
    Pg = chunk_gather(plan, B) if pg is None else pg
    p_pad = Bp.shape[1]
    grid, lr_s, v_s, pg_s, _, part_s = _grid_specs(plan, p_pad)

    def kernel(lr_ref, vals_ref, pg_ref, out_ref):
        for i in range(SB):
            l = lr_ref[i]
            v = vals_ref[i]
            M = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (W, C), 0) == l[None, :],
                v[None, :], 0.0)
            pg = pg_ref[i * C:(i + 1) * C, :].astype(jnp.float32)
            out_ref[i] = jnp.dot(M, pg,
                                 preferred_element_type=jnp.float32,
                                 precision=HI)

    partial_out = pl.pallas_call(
        kernel, grid=grid, in_specs=[lr_s, v_s, pg_s], out_specs=part_s,
        out_shape=jax.ShapeDtypeStruct((plan.nchunks, W, p_pad),
                                       jnp.float32),
        interpret=interpret_mode(),
    )(as_device_array(plan.lr), vals, Pg)
    return _combine(plan, partial_out, p).astype(B.dtype)


def chunk_spmv(plan: ChunkPlan, data, x):
    """A @ x for a vector x (n,): the p=1 Krylov-matvec core.

    The XLA fallback at p=1 costs ~49 ms at cfd2 scale on a v5e
    (measured, benchmarks/probe_random_gather.py: ~22 ms scalar gather +
    ~25 ms scalar segment scatter).  This kernel keeps the gather (the
    platform floor for per-entry access) but replaces the scatter with
    the chunk one-hot row reduction on the MXU plus one short sorted
    segment-sum over ``nchunks*W`` partials — ~2x the XLA path.
    """
    SB, C, W = plan.SB, plan.C, plan.W
    if plan.perm is not None:
        data = _permute_plan_values(plan, data)
    # f32 tiles: bf16 (SB, C) blocks violate the 16-sublane tile; the
    # bf16 win (the scalar gather itself) already happened in the take
    vals = _pad_entries(data, plan).reshape(plan.nchunks, C).astype(
        jnp.float32)
    xg = jnp.take(x, as_device_array(plan.gather_idx)).reshape(
        plan.nchunks, C).astype(jnp.float32)
    grid = (plan.nchunks // SB,)
    spec_c = pl.BlockSpec((SB, C), lambda s: (s, 0),
                          memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((SB, W), lambda s: (s, 0),
                          memory_space=pltpu.VMEM)

    def kernel(lr_ref, vals_ref, xg_ref, out_ref):
        for i in range(SB):
            l = lr_ref[i]
            # accumulate in f32 regardless of storage dtype (bf16 inputs
            # would otherwise sum up to C products in bf16 — the sibling
            # kernels force f32 via preferred_element_type)
            prod = (vals_ref[i] * xg_ref[i]).astype(jnp.float32)
            M = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
                == l[None, :], prod[None, :], 0.0)
            out_ref[i] = M.sum(axis=1)

    # partials stay f32 through the cross-chunk segment_sum (rows spanning
    # many chunks would otherwise re-accumulate in bf16); cast at the end
    partial_out = pl.pallas_call(
        kernel, grid=grid, in_specs=[spec_c, spec_c, spec_c],
        out_specs=spec_w,
        out_shape=jax.ShapeDtypeStruct((plan.nchunks, W), jnp.float32),
        interpret=interpret_mode(),
    )(as_device_array(plan.lr), vals, xg)
    seg = as_device_array(plan.seg_rows).reshape(-1)
    out = jax.ops.segment_sum(partial_out.reshape(-1), seg,
                              num_segments=plan.n + 1)
    return out[:plan.n].astype(x.dtype)


def chunk_sddmm(plan: ChunkPlan, X, Y, pg=None):
    """Values (nnz,) of (X @ Yᵀ) at the pattern, natural entry order.

    X rows arrive as per-chunk windows (one small contiguous gather), Y
    rows via the main entry gather (``pg`` may supply that
    :func:`chunk_gather` result, e.g. the spmm forward's residual)."""
    SB, C, W = plan.SB, plan.C, plan.W
    Yp, p = _pad_cols(Y)
    Xp, _ = _pad_cols(X)
    p_pad = Yp.shape[1]
    Pg = (jnp.take(Yp, as_device_array(plan.gather_idx), axis=0)
          if pg is None else pg)
    # the W-window stream and per-entry output stay f32 (bf16 (SB, C) /
    # (SB, W, ·) blocks violate the 16-sublane tile; they are ~1/16 of
    # the Pg traffic anyway) — only the entry gather Pg keeps X/Y's dtype
    Xw = jnp.take(Xp, as_device_array(
        np.minimum(plan.seg_rows, plan.n - 1)).reshape(-1), axis=0
    ).reshape(plan.nchunks, W, p_pad).astype(jnp.float32)
    grid, lr_s, _, pg_s, gw_s, _ = _grid_specs(plan, p_pad)
    dd_spec = pl.BlockSpec((SB, C), lambda s, j: (s, 0),
                           memory_space=pltpu.VMEM)

    def kernel(lr_ref, pg_ref, xw_ref, dd_ref):
        j = pl.program_id(1)
        for i in range(SB):
            l = lr_ref[i]
            Mt = (l[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (C, W), 1)).astype(jnp.float32)
            Xe = jnp.dot(Mt, xw_ref[i], preferred_element_type=jnp.float32,
                         precision=HI)
            pg = pg_ref[i * C:(i + 1) * C, :].astype(jnp.float32)
            contrib = (Xe * pg).sum(-1)

            @pl.when(j == 0)
            def _():
                dd_ref[i] = contrib

            @pl.when(j != 0)
            def _():
                dd_ref[i] = dd_ref[i] + contrib

    dd = pl.pallas_call(
        kernel, grid=grid, in_specs=[lr_s, pg_s, gw_s], out_specs=dd_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nchunks, C), jnp.float32),
        interpret=interpret_mode(),
    )(as_device_array(plan.lr), Pg, Xw)
    dd = dd.reshape(-1)[:plan.nnz]
    return dd.astype(X.dtype)


_PERM_PAD = {}


def _perm_pad_cache(plan_t: ChunkPlan):
    key = id(plan_t)
    hit = _PERM_PAD.get(key)
    if hit is not None and hit[0] is plan_t:
        return hit[1]
    with jax.ensure_compile_time_eval():
        pp = jnp.asarray(np.concatenate([
            plan_t.perm.astype(np.int64),
            np.zeros(plan_t.nnz_pad - plan_t.nnz, np.int64)]))
    _PERM_PAD[key] = (plan_t, pp)
    return pp


def chunk_spmm_bwd_fused(plan: ChunkPlan, plan_t: ChunkPlan, data, B, G,
                         pg=None, fast: bool = False):
    """Fused backward of A @ B: returns (d_data (nnz,), d_B (m, p)).

    One kernel pass over the row-sorted entries emits both the SDDMM
    values and V[e] = data_e · G[row_e]; a second row-sum pass over the
    column-sorted order of V yields AᵀG without any per-entry value
    permutation (V rows are gathered, which is fast; scalars are not).
    ``pg`` may supply the forward's :func:`chunk_gather` residual, saving
    the re-gather of B rows.  ``fast=True`` stores the intermediate V
    matrix in bfloat16 (halves its HBM bytes; gradB gains ~1e-3 relative
    error, gradA values stay exact) — measured neutral on v5e, where the
    V gather is transaction-bound."""
    SB, C, W = plan.SB, plan.C, plan.W
    Bp, p = _pad_cols(B)
    Gp, _ = _pad_cols(G)
    p_pad = Bp.shape[1]
    # f32 value tiles / W-window stream (bf16 blocks there violate the
    # 16-sublane tile); Pg and V — the dominant streams — keep B's dtype
    vals = _pad_entries(data, plan).reshape(plan.nchunks, C).astype(
        jnp.float32)
    Pg = chunk_gather(plan, B) if pg is None else pg
    Gw = jnp.take(Gp, as_device_array(
        np.minimum(plan.seg_rows, plan.n - 1)).reshape(-1), axis=0
    ).reshape(plan.nchunks, W, p_pad).astype(jnp.float32)
    grid, lr_s, v_s, pg_s, gw_s, _ = _grid_specs(plan, p_pad)
    dd_spec = pl.BlockSpec((SB, C), lambda s, j: (s, 0),
                           memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((SB * C, LANE), lambda s, j: (s, j),
                          memory_space=pltpu.VMEM)

    def kernel(lr_ref, vals_ref, pg_ref, gw_ref, dd_ref, v_ref):
        j = pl.program_id(1)
        for i in range(SB):
            l = lr_ref[i]
            v = vals_ref[i]
            Mt = (l[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (C, W), 1)).astype(jnp.float32)
            Ge = jnp.dot(Mt, gw_ref[i], preferred_element_type=jnp.float32,
                         precision=HI)
            pgf = pg_ref[i * C:(i + 1) * C, :].astype(jnp.float32)
            contrib = (Ge * pgf).sum(-1)

            @pl.when(j == 0)
            def _():
                dd_ref[i] = contrib

            @pl.when(j != 0)
            def _():
                dd_ref[i] = dd_ref[i] + contrib

            v_ref[i * C:(i + 1) * C, :] = (Ge * v[:, None]).astype(
                v_ref.dtype)

    v_dtype = jnp.bfloat16 if fast else B.dtype
    dd, V = pl.pallas_call(
        kernel, grid=grid, in_specs=[lr_s, v_s, pg_s, gw_s],
        out_specs=(dd_spec, v_spec),
        out_shape=(jax.ShapeDtypeStruct((plan.nchunks, C), jnp.float32),
                   jax.ShapeDtypeStruct((plan.nnz_pad, p_pad), v_dtype)),
        interpret=interpret_mode(),
    )(as_device_array(plan.lr), vals, Pg, Gw)
    d_data = dd.reshape(-1)[:plan.nnz].astype(data.dtype)

    # second pass: d_B[c] = Σ_{e in col c} V[e]  — row-sum of V in the
    # column-sorted order (plan_t), with unit weights.
    perm_pad = _perm_pad_cache(plan_t)
    Vg = jnp.take(V, perm_pad, axis=0)
    # ones stay f32: a bf16 (SB, C) block violates the 16-sublane tile.
    # (pad, not .at[:nnz].set — the basic-slice scatter's empty index
    # constant breaks JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS hoisting)
    ones = jnp.pad(jnp.ones((plan_t.nnz,), jnp.float32),
                   (0, plan_t.nnz_pad - plan_t.nnz))
    SBt, Ct, Wt = plan_t.SB, plan_t.C, plan_t.W
    grid_t, lr_t, v_t, pg_t, _, part_t = _grid_specs(plan_t, p_pad)

    def kernel2(lr_ref, ones_ref, vg_ref, out_ref):
        for i in range(SBt):
            l = lr_ref[i]
            o = ones_ref[i]
            M = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (Wt, Ct), 0)
                == l[None, :], o[None, :], 0.0)
            vg = vg_ref[i * Ct:(i + 1) * Ct, :].astype(jnp.float32)
            out_ref[i] = jnp.dot(M, vg,
                                 preferred_element_type=jnp.float32,
                                 precision=HI)

    partial_t = pl.pallas_call(
        kernel2, grid=grid_t, in_specs=[lr_t, v_t, pg_t], out_specs=part_t,
        out_shape=jax.ShapeDtypeStruct((plan_t.nchunks, Wt, p_pad),
                                       jnp.float32),
        interpret=interpret_mode(),
    )(as_device_array(plan_t.lr), ones.reshape(plan_t.nchunks, Ct), Vg)
    d_B = _combine(plan_t, partial_t, p).astype(B.dtype)
    return d_data, d_B
