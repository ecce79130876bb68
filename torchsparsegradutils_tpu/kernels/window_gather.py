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

TILE = 16384         # destination slots per grid step (128 x 128)
TR = TILE // 128     # destination sublane rows per step
WS_CAP = 65536       # max source-window elements (VMEM: 2 x WS x 4 B)
# Tile sizing: per-step DMA latency on a v5e is ~3 µs; with 2048-slot
# tiles the kernel was latency-bound (~5.7 ms at 3M nnz).  128x128 tiles
# put ~3-5 µs of compute per step, hiding the latency (~1 ms).


@dataclass(frozen=True)
class WindowPlan:
    """Static relayout plan: dst[d] = src[loc[d] + 128*w_rows[tile(d)]]."""
    dst_size: int
    dst_pad: int         # multiple of TILE
    src_size: int
    src_pad: int         # elements the caller must pad src to (mult of 128)
    WS: int              # window elements (multiple of 128)
    w_rows: np.ndarray   # (ntiles,) int32 window start in 128-element rows
    loc: np.ndarray      # (dst_pad,) int32 local source index, -1 => 0

    @property
    def ntiles(self) -> int:
        return self.dst_pad // TILE


def build_window_plan(src_of_dst: np.ndarray, dst_size: int,
                      src_size: int) -> WindowPlan | None:
    """Build a plan for a monotone dst->src map.

    Args:
      src_of_dst: (dst_size,) int64; source index per destination slot,
        -1 for "write zero".  Non-negative entries must be sorted
        (non-decreasing) — that is what makes windows local.
      dst_size / src_size: logical sizes.

    Returns None when some tile's window exceeds ``WS_CAP`` (degenerate
    skew) — callers fall back to the XLA scatter path.
    """
    src_of_dst = np.asarray(src_of_dst, np.int64)
    assert src_of_dst.shape == (dst_size,)
    dst_pad = -(-dst_size // TILE) * TILE
    m = np.full(dst_pad, -1, np.int64)
    m[:dst_size] = src_of_dst
    tiles = m.reshape(-1, TILE)
    valid = tiles >= 0
    any_valid = valid.any(axis=1)
    lo = np.where(any_valid,
                  np.min(np.where(valid, tiles, np.iinfo(np.int64).max),
                         axis=1), 0)
    hi = np.where(any_valid, np.max(np.where(valid, tiles, -1), axis=1), 0)
    # carry the previous window start into empty tiles
    for t in range(len(lo)):
        if not any_valid[t]:
            lo[t] = lo[t - 1] if t else 0
            hi[t] = lo[t]
    w_rows = lo // 128
    span = hi - w_rows * 128 + 1
    WS = int(-(-int(span.max()) // 128) * 128)
    if WS > WS_CAP:
        return None
    loc = np.where(m >= 0,
                   m - np.repeat(w_rows * 128, TILE), -1).astype(np.int32)
    src_pad = int(max(int((w_rows[-1:] * 128 + WS).max(initial=0)),
                      -(-src_size // 128) * 128,
                      WS))
    # every tile's window must stay inside src_pad
    src_pad = max(src_pad, int((w_rows * 128 + WS).max()))
    return WindowPlan(dst_size=dst_size, dst_pad=dst_pad,
                      src_size=src_size, src_pad=src_pad, WS=WS,
                      w_rows=w_rows.astype(np.int32), loc=loc)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _kernel(S: int):
    def kernel(w_ref, loc_ref, src_ref, out_ref, vwin, sems):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        def dma(row_start, buf):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(row_start, S)], vwin.at[buf],
                sems.at[buf])

        @pl.when(t == 0)
        def _():
            dma(w_ref[0], 0).start()

        @pl.when(t + 1 < nt)
        def _():
            dma(w_ref[t + 1], nxt).start()

        dma(w_ref[t], slot).wait()

        loc = loc_ref[:]                      # (TR, 128) int32
        slab = jnp.floor_divide(loc, 128)     # -1 stays negative
        lane = jnp.mod(loc, 128)              # floor mod: -1 -> 127
        acc = jnp.zeros((TR, 128), out_ref.dtype)
        for s in range(S):
            row = vwin[slot, s, :]
            g = jnp.take_along_axis(
                jnp.broadcast_to(row[None, :], (TR, 128)), lane, axis=1)
            acc = jnp.where(slab == s, g, acc)
        out_ref[:] = acc
    return kernel


def window_gather(plan: WindowPlan, src: jax.Array) -> jax.Array:
    """Apply the relayout: returns (dst_size,) with dst[d]=src[map[d]]."""
    assert src.ndim == 1 and src.shape[0] == plan.src_size
    pad = plan.src_pad - plan.src_size
    if pad:
        src = jnp.concatenate([src, jnp.zeros((pad,), src.dtype)])
    src2d = src.reshape(-1, 128)
    loc2d = as_device_array(plan.loc).reshape(-1, 128)
    S = plan.WS // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.ntiles,),
        in_specs=[
            pl.BlockSpec((TR, 128), lambda t, w: (t, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TR, 128), lambda t, w: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, S, 128), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel(S),
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
