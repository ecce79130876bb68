"""Pallas window-gather: monotone scalar relayouts at streaming speed.

The primitive behind DIA/ELL value-grid (un)packing: ``dst[d] =
src[map[d]]`` (or 0 where ``map[d] < 0``) for a *monotone* map — one
where consecutive destination slots read from a bounded sliding source
window.  Per destination tile the relevant source window is DMA'd into
VMEM (double-buffered against compute) and the in-window gather runs in
registers, so the whole relayout moves at streaming speed.

Two kernel modes, picked per plan:

* ``z8`` (preferred): per 8 destination rows, all sources live in a
  handful of candidate ``(8, 128)`` window slices (the map is
  near-linear, so the in-window source row tracks the destination row up
  to a tiny local spread Z).  Each sub-chunk costs Z slice reads +
  Z lane gathers + selects — per-slot work independent of tile size, so
  tiles can be large and the ~3 µs per-grid-step overhead amortises.
* ``drift`` (fallback for jittery maps): loop over the tile-wide drift
  range D with sliding ``(TR, 128)`` operand slices.

Why this exists: XLA lowers per-nonzero scalar scatters/gathers at
~25 ms for 3M elements on a v5e (measured; see CLAUDE.md invariants),
which would dominate every DIA/ELL op.

Reference counterpart: the value-layout surgery the reference does with
``Tensor.scatter_``/``index_select`` (e.g. utils/utils.py:236-346); here
it is a static-plan Pallas kernel keyed on the pattern hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import StaticArray, as_device_array

Z_CAP = 14           # max candidate slices per 8-row sub-chunk (z8 mode):
#                      8 dest rows draw from ~8/ratio source slabs + jitter
ZTR = 256            # destination rows per grid step in z8 mode
DRIFT_TR_OPTIONS = (64, 32, 16)  # tile heights for the drift fallback
D_CAP = 32           # max drift steps per tile (drift mode)
PADF = max(D_CAP, Z_CAP)  # front zero-pad rows on src (compressive maps)


@dataclass(frozen=True)
class BigShiftPlan:
    """Dominant-run decomposition of a monotone relayout.

    Measured on v5e: the z8 kernel costs ~6 ms for the cfd2-stencil DIA
    fill because every (8, 128) sub-chunk pays Z dynamic slices + gathers
    + selects — yet for a *full* stencil/ELL grid ~96 % of the map is ONE
    run with a constant shift (interior rows are a contiguous copy; only
    boundary-truncated rows deviate).  This plan executes that run as a
    plain XLA slice (a streaming memcpy) and routes only the short
    boundary strips through the window kernels: ``dst[lo:hi] =
    src[lo+shift : hi+shift]``; ``dst[:lo]`` / ``dst[hi:]`` via sub-plans
    (or a per-scalar XLA gather when a strip is too jittery — it is
    small)."""
    dst_size: int
    src_size: int
    lo: int
    hi: int
    shift: int
    top: Optional[object]          # WindowPlan | BigShiftPlan | None
    bot: Optional[object]
    top_map: Optional[np.ndarray]  # raw maps for the XLA strip fallback
    bot_map: Optional[np.ndarray]


MIN_BIGSHIFT = 4 * ZTR * 128     # below ~128K slots the kernels are fine


def _try_build_bigshift(src_of_dst: np.ndarray, dst_size: int,
                        src_size: int):
    if dst_size < MIN_BIGSHIFT:
        return None
    m = src_of_dst
    d = m - np.arange(dst_size)
    valid = m >= 0
    brk = np.ones(dst_size, bool)
    brk[1:] = (d[1:] != d[:-1]) | ~valid[1:] | ~valid[:-1]
    starts = np.nonzero(brk)[0]
    lens = np.diff(np.append(starts, dst_size))
    ok = valid[starts]
    if not ok.any():
        return None
    j = int(np.argmax(np.where(ok, lens, 0)))
    lo, ln = int(starts[j]), int(lens[j])
    if ln < 0.5 * dst_size:
        return None
    hi = lo + ln
    top = build_window_plan(m[:lo].copy(), lo, src_size) if lo else None
    bot = (build_window_plan(m[hi:].copy(), dst_size - hi, src_size)
           if hi < dst_size else None)
    return BigShiftPlan(
        dst_size=dst_size, src_size=src_size, lo=lo, hi=hi,
        shift=int(d[lo]), top=top, bot=bot,
        top_map=m[:lo].copy() if lo and top is None else None,
        bot_map=(m[hi:].copy() if hi < dst_size and bot is None
                 else None))


@dataclass(frozen=True)
class WindowPlan:
    """Static relayout plan (see module docstring for the two modes).

    Common: destination tiles of TR rows x 128 lanes; tile t's source
    window starts at padded-src row ``w_rows[t]`` and spans WR rows.

    z8 mode: for destination sub-chunk c (8 rows), sources live in window
    rows ``[qb[c] + z, qb[c] + z + 8)`` for z in [0, Z); ``loc`` packs
    ``z * 128 + lane`` (or -1 for "write zero").

    drift mode: destination row i reads window row ``i + loc[d]//128``;
    ``loc`` packs ``delta * 128 + lane``.
    """
    mode: str            # "z8" | "drift"
    dst_size: int
    dst_pad: int         # multiple of TR*128
    src_size: int
    src_pad: int         # elements the caller must pad src to (mult of 128)
    D: int               # window extra rows (drift span; z8: qb span + Z)
    TR: int              # destination rows per tile
    Z: int               # z8: candidate slices per sub-chunk (else 0)
    w_rows: np.ndarray   # (ntiles,) int32 window start in 128-element rows
    qb: Optional[np.ndarray]  # (ntiles*TR//8,) int32 sub-chunk slice base
    loc: np.ndarray      # (dst_pad,) int32 packed index, -1 => 0

    @property
    def ntiles(self) -> int:
        return self.dst_pad // (self.TR * 128)


def build_window_plan(src_of_dst: np.ndarray, dst_size: int,
                      src_size: int) -> WindowPlan | None:
    """Build a plan for a monotone dst->src map.

    Args:
      src_of_dst: (dst_size,) int64; source index per destination slot,
        -1 for "write zero".  Non-negative entries must be sorted
        (non-decreasing) — that is what makes windows local.
      dst_size / src_size: logical sizes.

    Returns None when the map is too skewed for both modes — callers
    fall back to the XLA scatter path.
    """
    src_of_dst = np.asarray(src_of_dst, np.int64)
    assert src_of_dst.shape == (dst_size,)
    plan = _try_build_bigshift(src_of_dst, dst_size, src_size)
    if plan is not None:
        return plan
    plan = _try_build_z8(src_of_dst, dst_size, src_size)
    if plan is not None:
        return plan
    for TR in DRIFT_TR_OPTIONS:
        plan = _try_build_drift(src_of_dst, dst_size, src_size, TR)
        if plan is not None:
            return plan
    return None


def _pad_map(src_of_dst, dst_size, TILE):
    dst_pad = -(-dst_size // TILE) * TILE
    m = np.full(dst_pad, -1, np.int64)
    m[:dst_size] = src_of_dst
    return m, dst_pad


def _carry_empty(base, any_valid):
    for t in range(len(base)):
        if not any_valid[t]:
            base[t] = base[t - 1] if t else 0
    return base


def _try_build_z8(src_of_dst, dst_size, src_size) -> WindowPlan | None:
    TR = ZTR
    TILE = TR * 128
    m, dst_pad = _pad_map(src_of_dst, dst_size, TILE)
    slab = m >> 7                                    # src row; -1 -> -1
    valid = m >= 0
    # the kernel reads candidate slices window[qb+z : qb+z+8], so dest
    # row i gets window row qb+z+i — base the plan on slab - row, whose
    # per-sub-chunk spread is only the local jitter (Z ~ 2-4)
    row_in_sub = (np.arange(dst_pad) % (8 * 128)) // 128
    rel = slab - row_in_sub
    sub = rel.reshape(-1, 8 * 128)
    vsub = valid.reshape(-1, 8 * 128)
    any_v = vsub.any(axis=1)
    big = np.iinfo(np.int64).max
    qb_abs = np.where(any_v,
                      np.min(np.where(vsub, sub, big), axis=1), 0)
    qb_abs = _carry_empty(qb_abs, any_v)
    qhi = np.where(any_v, np.max(np.where(vsub, sub, -big), axis=1),
                   qb_abs)
    z_span = qhi - qb_abs                            # z in [0, z_span]
    if int(z_span.max(initial=0)) + 1 > Z_CAP:
        return None
    Z = int(z_span.max(initial=0)) + 1
    # per tile: window base = min qb_abs of its sub-chunks
    qb_t = qb_abs.reshape(-1, TR // 8)
    w_abs = qb_t.min(axis=1)
    # sub-chunk base relative to its tile's window
    qb = (qb_abs - np.repeat(w_abs, TR // 8))
    D = int(qb.max(initial=0)) + Z + 8               # window extra rows
    if D > 4 * TR:                                   # degenerate skew
        return None
    if (w_abs < -PADF).any():
        return None
    z = np.where(valid, rel - np.repeat(qb_abs, 8 * 128), 0)
    loc = np.where(valid, z * 128 + (m & 127), -1).astype(np.int32)
    w_rows = (w_abs + PADF).astype(np.int32)
    WR = TR + D
    src_pad = int(max((w_rows.astype(np.int64) * 128 + WR * 128).max(),
                      PADF * 128 + -(-src_size // 128) * 128))
    return WindowPlan(mode="z8", dst_size=dst_size, dst_pad=dst_pad,
                      src_size=src_size, src_pad=src_pad, D=D, TR=TR, Z=Z,
                      w_rows=w_rows, qb=qb.astype(np.int32), loc=loc)


def _try_build_drift(src_of_dst, dst_size, src_size,
                     TR: int) -> WindowPlan | None:
    TILE = TR * 128
    m, dst_pad = _pad_map(src_of_dst, dst_size, TILE)
    slab = m >> 7                                    # src row; -1 -> -1
    row = (np.arange(dst_pad) % TILE) // 128         # in-tile dest row
    rel = np.where(m >= 0, slab - row, np.iinfo(np.int64).max)
    rel_t = rel.reshape(-1, TILE)
    any_valid = (m.reshape(-1, TILE) >= 0).any(axis=1)
    base = np.where(any_valid, rel_t.min(axis=1), 0)
    base = _carry_empty(base, any_valid)
    # base may be negative (compressive maps near the start); the caller
    # front-pads src by PADF rows of zeros so windows never pre-start
    if (base < -PADF).any():
        return None
    delta = np.where(m >= 0,
                     slab - row - np.repeat(base, TILE), -1)
    D = int(delta.max(initial=0)) + 1
    if D > D_CAP:
        return None
    loc = np.where(m >= 0, delta * 128 + (m & 127), -1).astype(np.int32)
    w_rows = (base + PADF).astype(np.int32)          # into the padded src
    WS = (TR + D) * 128
    src_pad = int(max((w_rows.astype(np.int64) * 128 + WS).max(),
                      PADF * 128 + -(-src_size // 128) * 128))
    return WindowPlan(mode="drift", dst_size=dst_size, dst_pad=dst_pad,
                      src_size=src_size, src_pad=src_pad, D=D, TR=TR, Z=0,
                      w_rows=w_rows, qb=None, loc=loc)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _dma_prologue(w_ref, src_ref, vwin, sems, WR):
    """Standard double-buffered window fetch; returns the live slot."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    two = jnp.int32(2)      # literal stays int32 under x64
    slot = jax.lax.rem(t, two)
    nxt = jax.lax.rem(t + 1, two)

    def dma(tt, buf):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(w_ref[tt], WR)], vwin.at[buf], sems.at[buf])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        dma(t + 1, nxt).start()

    dma(t, slot).wait()
    return t, slot


def _kernel_drift(D: int, TR: int):
    WR = TR + D          # window rows

    def kernel(w_ref, loc_ref, src_ref, out_ref, vwin, sems):
        _, slot = _dma_prologue(w_ref, src_ref, vwin, sems, WR)
        loc = loc_ref[:]                      # (TR, 128) int32
        delta = jnp.floor_divide(loc, 128)    # -1 stays negative
        lane = jnp.mod(loc, 128)              # floor mod: -1 -> 127
        acc = jnp.zeros((TR, 128), out_ref.dtype)
        for s in range(D):
            # dest row i reads window row i + s: a sliding (TR, 128)
            # operand slice — per-slot work is O(D), not O(source span)
            g = jnp.take_along_axis(vwin[slot, s:s + TR, :], lane, axis=1)
            acc = jnp.where(delta == s, g, acc)
        out_ref[:] = acc
    return kernel


def _kernel_z8(Z: int, TR: int, D: int):
    WR = TR + D
    NSUB = TR // 8

    def kernel(w_ref, qb_ref, loc_ref, src_ref, out_ref, vwin, sems):
        t, slot = _dma_prologue(w_ref, src_ref, vwin, sems, WR)
        for c in range(NSUB):
            qb = qb_ref[t * NSUB + c]
            loc = loc_ref[8 * c:8 * (c + 1), :]       # (8, 128)
            zid = jnp.floor_divide(loc, 128)
            lane = jnp.mod(loc, 128)
            acc = jnp.zeros((8, 128), out_ref.dtype)
            for z in range(Z):
                sl = vwin[slot, pl.ds(qb + z, 8), :]  # (8, 128) candidate
                g = jnp.take_along_axis(sl, lane, axis=1)
                acc = jnp.where(zid == z, g, acc)
            out_ref[8 * c:8 * (c + 1), :] = acc
    return kernel


def window_gather(plan, src: jax.Array) -> jax.Array:
    """Apply the relayout: returns (dst_size,) with dst[d]=src[map[d]].

    vmap-safe: the kernel DMAs from an ANY-space operand, which Pallas's
    batching rule cannot handle on TPU, so vmap lowers to a sequential
    scan over the batch (``custom_batching.sequential_vmap``).
    """
    if isinstance(plan, BigShiftPlan):
        parts = []
        if plan.lo:
            parts.append(window_gather(plan.top, src)
                         if plan.top is not None else
                         window_gather_xla(plan.top_map, src, plan.lo))
        parts.append(jax.lax.slice_in_dim(src, plan.lo + plan.shift,
                                          plan.hi + plan.shift))
        if plan.hi < plan.dst_size:
            parts.append(window_gather(plan.bot, src)
                         if plan.bot is not None else
                         window_gather_xla(plan.bot_map, src,
                                           plan.dst_size - plan.hi))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    @jax.custom_batching.sequential_vmap
    def run(src):
        return _window_gather_impl(plan, src)

    return run(src)


def _window_gather_impl(plan: WindowPlan, src: jax.Array) -> jax.Array:
    assert src.ndim == 1 and src.shape[0] == plan.src_size
    # Mosaic's lane gather (take_along_axis) and dynamic sublane slices
    # only handle 32-bit element types: widen 16-bit values for the
    # kernel and narrow after.  Stencil fills rarely reach here at size —
    # the BigShiftPlan memcpy run (~96 % of a full-grid map) stays at the
    # storage dtype; only short boundary strips pay the widening.
    orig_dtype = src.dtype
    if src.dtype.itemsize < 4:
        src = src.astype(jnp.float32)
    tail = plan.src_pad - plan.src_size - PADF * 128
    src = jnp.concatenate([jnp.zeros((PADF * 128,), src.dtype), src,
                           jnp.zeros((max(tail, 0),), src.dtype)])
    src2d = src.reshape(-1, 128)
    loc2d = as_device_array(plan.loc).reshape(-1, 128)
    TR = plan.TR
    num_prefetch = 1 if plan.mode == "drift" else 2
    prefetch = ((as_device_array(plan.w_rows),) if plan.mode == "drift"
                else (as_device_array(plan.w_rows),
                      as_device_array(plan.qb)))
    if plan.mode == "drift":
        kernel = _kernel_drift(plan.D, TR)

        def loc_map(t, w):
            return (t, 0)

        def out_map(t, w):
            return (t, 0)
    else:
        kernel = _kernel_z8(plan.Z, TR, plan.D)

        def loc_map(t, w, q):
            return (t, 0)

        def out_map(t, w, q):
            return (t, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(plan.ntiles,),
        in_specs=[
            pl.BlockSpec((TR, 128), loc_map),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TR, 128), out_map),
        scratch_shapes=[
            pltpu.VMEM((2, TR + plan.D, 128), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.dst_pad // 128, 128),
                                       src.dtype),
        interpret=_interpret(),
    )(*prefetch, loc2d, src2d)
    return out.reshape(-1)[:plan.dst_size].astype(orig_dtype)


@lru_cache(maxsize=256)
def build_expand_plan(idx_sa: StaticArray, src_size: int):
    """Plan for the monotone *expansion* ``dst[e] = src[idx[e]]`` with
    ``idx`` sorted non-decreasing (e.g. the per-entry row index of a
    CSR-canonical pattern: each source row is read by a short contiguous
    run of entries).  None when the planner rejects the map."""
    idx = idx_sa.arr.astype(np.int64)
    if idx.ndim != 1 or idx.size == 0:
        return None
    return build_window_plan(idx, int(idx.size), src_size)


_XLA_IDX_CACHE: dict = {}


def window_gather_xla(src_of_dst: np.ndarray, src: jax.Array,
                      dst_size: int) -> jax.Array:
    """XLA fallback (per-scalar gather; slow on TPU, fine on CPU/f64)."""
    # cache the sanitized index map per (table, oob sentinel): recomputing
    # np.where each call would hand jnp a fresh numpy array every trace,
    # inlining a dst-sized literal into the HLO (see as_device_array)
    ckey = (id(src_of_dst), int(src.shape[0]))
    hit = _XLA_IDX_CACHE.get(ckey)
    if hit is None or hit[0] is not src_of_dst:
        idx_np = np.where(src_of_dst >= 0, src_of_dst, src.shape[0])
        _XLA_IDX_CACHE[ckey] = (src_of_dst, as_device_array(idx_np))
        hit = _XLA_IDX_CACHE[ckey]
    idx = hit[1]
    srcz = jnp.concatenate([src, jnp.zeros((1,), src.dtype)])
    return jnp.take(srcz, idx)
