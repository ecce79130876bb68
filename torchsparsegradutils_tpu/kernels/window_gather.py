"""Pallas window-gather: monotone scalar relayouts at streaming speed.

The primitive behind DIA/ELL value-grid (un)packing: ``dst[d] =
src[map[d]]`` (or 0 where ``map[d] < 0``) for a *monotone* map — one
where consecutive destination slots read from a bounded sliding source
window.  Per destination tile (2048 slots) the relevant source window is
DMA'd into VMEM (double-buffered against compute) and the in-window
gather decomposes into per-128-slab lane gathers + selects, so the whole
relayout runs at HBM streaming speed.

Why this exists: XLA lowers per-nonzero scalar scatters/gathers at
~25 ms for 3M elements on a v5e (measured; see CLAUDE.md invariants),
which would dominate every DIA/ELL op.  This kernel does the same
relayout in ~0.2 ms because every memory access is a contiguous DMA or
an in-register lane shuffle.

Reference counterpart: the value-layout surgery the reference does with
``Tensor.scatter_``/``index_select`` (e.g. utils/utils.py:236-346); here
it is a static-plan Pallas kernel keyed on the pattern hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import StaticArray, as_device_array

TR_OPTIONS = (64, 32, 16)   # destination sublane rows per grid step
D_CAP = 32           # max drift steps per tile (see below)
PADF = D_CAP         # front zero-pad rows on src (compressive maps)
# Because the map is monotone and near-linear, destination row i of a
# tile reads from window row i + delta with a *small*, slowly drifting
# delta (the hole/expansion drift across one tile plus jitter).  The
# kernel therefore loops over delta in [0, D) with a sliding (TR, 128)
# operand slice — D is typically 2-12 — instead of testing every source
# slab (which scales with the tile's whole source span and made the
# kernel compute-bound: ~5.7 ms at 3M nnz, vs ~1 ms this way).


@dataclass(frozen=True)
class WindowPlan:
    """Static relayout plan.

    For destination slot d in tile t at in-tile row i = (d % TILE)//128:
    ``dst[d] = src[(w_rows[t] + i + loc[d]//128) * 128 + loc[d] % 128]``
    (or 0 when ``loc[d] < 0``) — i.e. loc packs (delta, lane).
    """
    dst_size: int
    dst_pad: int         # multiple of TR*128
    src_size: int
    src_pad: int         # elements the caller must pad src to (mult of 128)
    D: int               # drift steps per tile (window = TR + D rows)
    TR: int              # destination rows per tile
    w_rows: np.ndarray   # (ntiles,) int32 window start in 128-element rows
    loc: np.ndarray      # (dst_pad,) int32 delta*128 + lane, -1 => 0

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

    Returns None when every tile height's drift exceeds ``D_CAP``
    (degenerate skew) — callers fall back to the XLA scatter path.
    """
    src_of_dst = np.asarray(src_of_dst, np.int64)
    assert src_of_dst.shape == (dst_size,)
    for TR in TR_OPTIONS:
        plan = _try_build(src_of_dst, dst_size, src_size, TR)
        if plan is not None:
            return plan
    return None


def _try_build(src_of_dst: np.ndarray, dst_size: int, src_size: int,
               TR: int) -> WindowPlan | None:
    TILE = TR * 128
    dst_pad = -(-dst_size // TILE) * TILE
    m = np.full(dst_pad, -1, np.int64)
    m[:dst_size] = src_of_dst
    slab = m >> 7                                   # src row; -1 -> -1
    row = (np.arange(dst_pad) % TILE) // 128        # in-tile dest row
    rel = np.where(m >= 0, slab - row, np.iinfo(np.int64).max)
    rel_t = rel.reshape(-1, TILE)
    any_valid = (m.reshape(-1, TILE) >= 0).any(axis=1)
    base = np.where(any_valid, rel_t.min(axis=1), 0)
    for t in range(len(base)):                      # carry into empty tiles
        if not any_valid[t]:
            base[t] = base[t - 1] if t else 0
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
    w_rows = (base + PADF).astype(np.int32)         # into the padded src
    WS = (TR + D) * 128
    src_pad = int(max((w_rows.astype(np.int64) * 128 + WS).max(),
                      PADF * 128 + -(-src_size // 128) * 128))
    plan = WindowPlan(dst_size=dst_size, dst_pad=dst_pad,
                      src_size=src_size, src_pad=src_pad, D=D, TR=TR,
                      w_rows=w_rows, loc=loc)
    return plan


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _kernel(D: int, TR: int):
    WR = TR + D          # window rows

    def kernel(w_ref, loc_ref, src_ref, out_ref, vwin, sems):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        def dma(row_start, buf):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(row_start, WR)], vwin.at[buf],
                sems.at[buf])

        @pl.when(t == 0)
        def _():
            dma(w_ref[0], 0).start()

        @pl.when(t + 1 < nt)
        def _():
            dma(w_ref[t + 1], nxt).start()

        dma(w_ref[t], slot).wait()

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


def window_gather(plan: WindowPlan, src: jax.Array) -> jax.Array:
    """Apply the relayout: returns (dst_size,) with dst[d]=src[map[d]]."""
    assert src.ndim == 1 and src.shape[0] == plan.src_size
    tail = plan.src_pad - plan.src_size - PADF * 128
    src = jnp.concatenate([jnp.zeros((PADF * 128,), src.dtype), src,
                           jnp.zeros((max(tail, 0),), src.dtype)])
    src2d = src.reshape(-1, 128)
    loc2d = as_device_array(plan.loc).reshape(-1, 128)
    TR = plan.TR
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.ntiles,),
        in_specs=[
            pl.BlockSpec((TR, 128), lambda t, w: (t, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TR, 128), lambda t, w: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TR + plan.D, 128), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel(plan.D, TR),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.dst_pad // 128, 128),
                                       src.dtype),
        interpret=_interpret(),
    )(as_device_array(plan.w_rows), loc2d, src2d)
    return out.reshape(-1)[:plan.dst_size]


def window_gather_xla(src_of_dst: np.ndarray, src: jax.Array,
                      dst_size: int) -> jax.Array:
    """XLA fallback (per-scalar gather; slow on TPU, fine on CPU/f64)."""
    idx = jnp.asarray(np.where(src_of_dst >= 0, src_of_dst, src.shape[0]))
    srcz = jnp.concatenate([src, jnp.zeros((1,), src.dtype)])
    return jnp.take(srcz, idx)
