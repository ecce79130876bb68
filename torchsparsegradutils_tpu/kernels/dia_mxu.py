"""MXU banded-matmul core for DIA SpMM / SDDMM.

The round-2 DIA kernels (``dia._spmm_core_pallas`` / ``_dia_sddmm_pallas``)
are VPU-bound: every diagonal costs a misaligned sublane slice (3-5
funnel-shift ops per vreg) plus an accumulator read-modify-write —
~2.8 ms at cfd2-stencil scale where the stream roofline is ~0.5 ms.
This core moves the shift-multiply-accumulate onto the MXU:

1. **Cluster** the K offsets into groups whose span fits a few lane
   blocks (the cfd2-like stencil's 25 offsets form 3 clusters:
   ``{-51..51}``, ``{2401..2500}``, ``{-2500..-2401}``).
2. Per 128-row sub-tile and cluster ``c``, build the banded operand
   ``M[j, l] = v[j, k]`` for ``l = j + off_k - start_c`` directly with
   per-lane-block *static* gathers from the padded value tile (the
   gather index ``(j, l) -> k`` is a compile-time constant; missing
   positions read a zeroed dummy lane).  No scatter matmul, no funnel
   shifts, and the ``v`` values enter the product exactly.
3. One MXU contraction per cluster and bf16-split pair:
   ``out[j, :] += M(128, E+128) @ Win_c(E+128, 128)`` where ``Win_c``
   is the cluster's contiguous source-row window — because
   ``M[j, j + (off_k - start_c)] = v[j, k]`` makes the matmul exactly
   ``Σ_k v[j,k] · B[row_j + off_k]``.
4. **Rolling halo**: all cluster windows are slices of ONE resident
   window of ``span + R_T`` source rows that advances ``R_T`` rows per
   grid step — each step DMAs only the ``R_T`` *new* rows (into a
   double-buffered staging tile) and shifts the resident window down
   with cheap VMEM copies.  Every B row crosses HBM exactly once
   (probed on v5e: per-cluster windows re-read B 3.4x and pin the
   kernel at ~1.1 ms of pure DMA).
5. **Pre-split operands** (round-4): f32 operands are decomposed into
   bf16 components *once* — the streamed operand at DMA-landing time
   (the halo is resident as up to three bf16 halos), the value grid
   outside the kernel (hoistable by ``prepared_matvec``) — so the
   per-sub-tile body is pure gathers + bf16 MXU passes.  Round-3's
   kernel re-split every window per sub-tile, which made it VPU-bound
   (measured 1.28 ms vs the 0.74 ms MXU floor at cfd2-stencil scale).
6. **Virtual padding** (round-4): the kernel never materialises a
   padded copy of B/Y (a 63 MB HBM round-trip per call at cfd2 scale).
   Boundary grid steps get statically-sized partial DMAs; out-of-range
   halo rows are zero-filled in VMEM.
7. f32 x f32 runs the exact **bf16x6 decomposition** (3-way splits;
   bf16 products are exact in f32 and the dropped cross terms are
   O(2^-24), so the result matches an f32 matmul to the library's
   1e-5 contract).  Mixed f32 x bf16 takes 3 passes, bf16 x bf16 one.
   ``TSGU_MXU_PREC=fast`` opts into 2-way splits / 3 passes
   (~2^-16 relative, TF32-like) for f32 operands.

The reference runs these patterns through generic CUDA gather kernels
(sparse_matmul.py:155); the banded-matmul formulation has no reference
analogue — it exists because the TPU's MXU is the only unit that can
"gather" at full rate, via structured banded operands.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import as_device_array

LANE = 128
MAX_CLUSTERS = 6
# v5e/v6e cores carry 128 MB of VMEM; the default Mosaic scoped limit is
# only 16 MB, so the kernels raise it (vmem_limit_bytes below) and plan
# against a 40 MB budget — bigger R_T tiles mean fewer rolling-halo steps
# (roll traffic scales with step count) and larger, better-pipelined DMAs.
# Override: TSGU_MXU_VMEM (MB).
VMEM_BUDGET = int(os.environ.get("TSGU_MXU_VMEM", "40")) * 1024 * 1024
VMEM_LIMIT = VMEM_BUDGET + 24 * 1024 * 1024   # headroom for Mosaic scratch
DUMMY = LANE - 1          # zeroed pad lane of the value tile


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _prec() -> str:
    """MXU decomposition precision for f32 operands: ``exact`` (3-way
    bf16 splits, 6 passes for f32xf32 — matches f32 to ~2^-23) or
    ``fast`` (2-way splits, 3 passes, ~2^-16 — TF32-like)."""
    return os.environ.get("TSGU_MXU_PREC", "exact")


def _body_mode() -> str:
    """Inner-loop structure of the SpMM/SDDMM cores.

    Round-5 A/B on a real v5e (benchmarks/probe_r5.py spmm_core_arg /
    sddmm_core_arg, traced-argument grid):

    * ``legacy`` (default): the chained ``acc = acc + dot`` body —
      **1.953 ms** spmm core at cfd2-stencil scale.
    * ``tree``: independent dots, balanced-tree combine — 2.145 ms.
      The "serial VPU add between MXU issues" hypothesis was wrong;
      the extra live operands cost more than the chain.
    * ``pair``: one k=C·(E+128) contraction per pass pair — 2.085 ms
      (the VERDICT-r4 suggested fix; the per-sub-tile VMEM copy
      assembling the concatenated window eats the fewer-matmuls win).
    * ``f32dot``: no pre-splits at all — ONE f32 halo, f32 banded
      operands, and ``dot_general(..., precision=HIGHEST)`` so Mosaic
      decomposes inside the MXU pipeline.  Motivated by the round-5
      ``nogather``/``nodot`` probes (1.815 / 1.821 ms vs full 1.953):
      neither the gathers nor the dots are the critical path — the
      split/roll/window machinery is.  **Accuracy caveat (measured
      on-chip)**: Mosaic honors HIGHEST for the SDDMM's ``(a,k)x(b,k)``
      dot (2.9e-7 vs the manual bf16x6) but NOT for the SpMM's
      ``(a,k)x(k,b)`` dot (2.2e-3 — bf16x1), so the SpMM half of this
      mode is probe-only and must not carry the exact-f32 contract;
      the default stays ``legacy``.

    The knob stays for future hardware.  sddmm: tree 1.670 / pair 1.644
    (legacy body not separately chained there; parts still tree-combine).
    """
    return os.environ.get("TSGU_MXU_BODY", "legacy")


def _tree_sum(parts):
    """Balanced-tree sum of equal-shape arrays (log-depth add chain)."""
    parts = list(parts)
    while len(parts) > 1:
        nxt = [a + b for a, b in zip(parts[0::2], parts[1::2])]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _nsplits(dtype, prec: str) -> int:
    if dtype == jnp.bfloat16:
        return 1
    if _body_mode() == "f32dot":
        return 1          # Mosaic decomposes inside the dot (HIGHEST)
    return 2 if prec == "fast" else 3


def _pass_pairs(nsv: int, nsb: int):
    """(i, j) bf16-component pairs to contract, smallest terms first.

    Keeps every pair with ``i + j <= max(nsv, nsb) - 1``: for 3x3 the
    standard 6-term bf16x6 set (drops O(2^-24) cross terms), for 2x2
    the 3-term fast set, for 1xN all N terms."""
    cut = max(nsv, nsb) - 1
    ps = [(i, j) for i in range(nsv) for j in range(nsb) if i + j <= cut]
    return sorted(ps, key=lambda t: -(t[0] + t[1]))


def split_bf16(x, ns: int):
    """Decompose x into ``ns`` bf16 components with x ~= Σ components
    (exact for ns=3 on f32: 3 x 8 mantissa bits)."""
    if ns == 1:
        return (x.astype(jnp.bfloat16),)
    xf = x.astype(jnp.float32)
    x0 = xf.astype(jnp.bfloat16)
    r = xf - x0.astype(jnp.float32)
    x1 = r.astype(jnp.bfloat16)
    if ns == 2:
        return (x0, x1)
    x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return (x0, x1, x2)


def split_f32_components(x, ns: int):
    """bf16 components of x *widened back to f32* — Mosaic's lane gather
    (take_along_axis) only handles 32-bit element types, so the in-kernel
    banded-operand gathers run on these f32 tiles and the (lossless)
    bf16 narrowing happens after the gather."""
    if ns == 1:
        return (x.astype(jnp.float32),)
    return tuple(c.astype(jnp.float32) for c in split_bf16(x, ns))


def split_grid_for_mxu(grid_v):
    """Pre-split a DIA value grid for :func:`spmm_core_mxu` — call once
    before a Krylov loop (``prepared_matvec``) so iterations skip it."""
    return split_f32_components(grid_v, _nsplits(grid_v.dtype, _prec()))


def cluster_offsets(offsets: np.ndarray, span_cap: int):
    """Greedy left-to-right clustering of sorted offsets; each cluster's
    span satisfies ``off_max - off_min <= span_cap``.  Returns a list of
    (start, members): 8-aligned window start + indices into offsets."""
    clusters = []
    start = 0
    for i in range(1, len(offsets) + 1):
        if i == len(offsets) or offsets[i] - offsets[start] > span_cap:
            base = int(offsets[start])
            clusters.append(((base // 8) * 8, np.arange(start, i)))
            start = i
    return clusters


def plan_clusters(offsets: np.ndarray):
    """Pick a clustering with a uniform, small per-cluster lane width;
    returns (clusters, E_pad) or None when the VPU shift kernel is
    cheaper (cost gate) or the pattern is out of scope."""
    K = len(offsets)
    if K > LANE - 1:          # value tiles pad to 128 lanes + dummy
        return None
    best = None
    for span_cap in (118, 246, 502, 1014):
        cl = cluster_offsets(offsets, span_cap)
        if len(cl) > MAX_CLUSTERS:
            continue
        e_pad = LANE
        for st, members in cl:
            span8 = int(offsets[members[-1]]) - st   # <= span_cap + 7
            e_pad = max(e_pad, -(-(span8 + 1) // LANE) * LANE)
        # cost per (row, output lane), arbitrary units: 6 bf16 MXU passes
        # (exact-f32 split) over (E+128) contraction lanes at ~128
        # MACs/lane-cycle vs ~7 VPU ops per (vreg, diagonal) for the
        # funnel-shift kernel.
        mxu_cost = 6 * len(cl) * (e_pad + LANE) / 128.0
        vpu_cost = 7.0 * K
        if best is None or mxu_cost < best[0]:
            best = (mxu_cost, cl, e_pad, vpu_cost)
    if best is None or best[0] >= best[3]:
        return None
    return best[1], best[2]


def _geometry(clusters, E: int, n: int, m: int, nsb: int, item_b: int,
              n_tables: int = 1, n_val_inputs: int = 3, halo_item: int = 2,
              fresh: bool = False, fresh_split: bool = False):
    """Rolling-window geometry: tile size, halo span, clipping to n.
    Tile i's halo holds source rows ``[i*R_T + min_st, i*R_T + min_st +
    H)``; cluster c's window for sub-tile ``s`` starts ``coff_c +
    128*s`` rows into the halo.  VMEM model counts the ``nsb`` bf16
    halos, the double-buffered f32/bf16 staging tile, and — at 2x each,
    because the Pallas pipeline double-buffers every grid-indexed
    block — the value/x inputs and the out block (measured: the round-3
    single-buffer model said 9.8 MB where Mosaic compiled 16.2 MB).
    Returns None when no tile size fits the budget (callers fall back
    to the VPU/XLA cores)."""
    C = len(clusters)
    starts = [st for st, _ in clusters]
    min_st, max_st = min(starts), max(starts)
    span = -(-(max_st + E - min_st) // LANE) * LANE
    nb = E // LANE + 1
    n_cap = -(-n // LANE) * LANE
    # 8192/6144 first: under a single halo they fit the budget at cfd2
    # scale — half the streaming steps (roll traffic ∝ steps)
    for R_T in (8192, 6144, 4096, 3072, 2048, 1536, 1024, 768, 512, 384,
                256, 128):
        R_T = min(R_T, max(LANE, n_cap))
        H = R_T + span
        if fresh:
            # double-buffered full window, no staging, no split halos
            stream = 2 * H * LANE * halo_item
        elif fresh_split:
            # double-buffered f32 window + single-buffered bf16 halos
            stream = 2 * H * LANE * 4 + nsb * H * LANE * 2
        else:
            stream = (nsb * H * LANE * halo_item    # split halos
                      + 2 * R_T * LANE * item_b)    # staging double buffer
        vmem = (stream
                + 2 * R_T * LANE * item_b           # out block, 2 buffers
                + 2 * n_val_inputs * R_T * LANE * 4  # value/x inputs, f32
                + 2 * n_tables * C * nb * LANE * LANE * 4)
        if vmem <= VMEM_BUDGET:
            ntiles = -(-n // R_T)
            coffs = [st - min_st for st in starts]
            return R_T, span, ntiles, min_st, coffs
    return None


def _stage_schedule(ntiles: int, R_T: int, start0: int, m: int):
    """Static DMA schedule for the per-step staging refill: step i >= 1
    covers source rows ``[i*R_T + start0, +R_T)``.  Returns the
    contiguous full-DMA range ``[i0f, i1f)`` and a dict of boundary
    steps -> (zero_head_rows, valid_rows)."""
    boundary = {}
    full = []
    for i in range(1, ntiles):
        a = i * R_T + start0
        lo, hi = max(a, 0), min(a + R_T, m)
        lv = max(0, hi - lo)
        zh = (lo - a) if lv else 0
        if lv == R_T:
            full.append(i)
        else:
            boundary[i] = (zh, lv)
    if full:
        i0f, i1f = full[0], full[-1] + 1
        assert full == list(range(i0f, i1f)), "staging schedule not contiguous"
    else:
        i0f = i1f = 1
    return i0f, i1f, boundary


def _init_schedule(min_st: int, H: int, R_T: int, m: int):
    """Initial halo fill: halo rows [0, H) <-> source rows
    [min_st, min_st + H).  Returns (LO, chunks, tail0): zero rows
    [0, LO) and [tail0, H); chunks are (dst_off, src_start, nrows)."""
    lo_r = max(0, min_st)
    LO = lo_r - min_st
    Lh = max(0, min(m, min_st + H) - lo_r)
    chunks = []
    t = 0
    while t * R_T < Lh:
        chunks.append((LO + t * R_T, lo_r + t * R_T, min(R_T, Lh - t * R_T)))
        t += 1
    return LO, chunks, LO + Lh


_DN_NT = (((1,), (0,)), ((), ()))     # (a, k) @ (k, b)
_DN_TT = (((1,), (1,)), ((), ()))     # (a, k) @ (b, k)^T


def _m_gather_idx(clusters, offsets, E: int) -> np.ndarray:
    """Static (C, nb, 128, 128) gather index building the banded operand:
    ``M_b[j, lam] = vt_pad[j, idx[c, b, j, lam]]`` with the dummy lane
    (zero) at missing positions."""
    C = len(clusters)
    nb = E // LANE + 1
    idx = np.full((C, nb, LANE, LANE), DUMMY, np.int32)
    j = np.arange(LANE)
    for c, (st, members) in enumerate(clusters):
        for k in members:
            l = j + int(offsets[k]) - st          # target lane per row
            b, lam = l // LANE, l % LANE
            idx[c, b, j, lam] = int(k)
    return idx


def _p_extract(clusters, offsets, E: int, K: int):
    """Static per-cluster extraction tables for SDDMM: target lane
    ``k`` reads ``P[j, j + off_k - start_c]``.  Returns (C, nb, 128, 128)
    int32 indices into each P lane-block and a matching bool mask."""
    C = len(clusters)
    nb = E // LANE + 1
    idx = np.zeros((C, nb, LANE, LANE), np.int32)
    msk = np.zeros((C, nb, LANE, LANE), np.float32)
    j = np.arange(LANE)
    for c, (st, members) in enumerate(clusters):
        for k in members:
            e = j + int(offsets[k]) - st          # source lane per row
            b, lam = e // LANE, e % LANE
            idx[c, b, j, int(k)] = lam
            msk[c, b, j, int(k)] = 1.0
    return idx, msk


# --------------------------------------------------------------------------
# in-kernel halo-stream helpers (shared by SpMM and SDDMM)
# --------------------------------------------------------------------------

def _zero_halos(halos, off, nrows: int):
    """halo[off : off+nrows] = 0 for every split halo (off may be traced,
    nrows static, both 8-row aligned)."""
    fullb, tail = nrows // LANE, nrows % LANE
    if fullb:
        def z(t, _):
            for h in halos:
                h[pl.ds(off + t * LANE, LANE), :] = jnp.zeros(
                    (LANE, LANE), h.dtype)
            return 0
        jax.lax.fori_loop(0, fullb, z, 0)
    if tail:
        for h in halos:
            h[pl.ds(off + fullb * LANE, tail), :] = jnp.zeros(
                (tail, LANE), h.dtype)


def _zero_staging(staging, slot, off: int, nrows: int):
    fullb, tail = nrows // LANE, nrows % LANE
    if fullb:
        def z(t, _):
            staging[slot, pl.ds(off + t * LANE, LANE), :] = jnp.zeros(
                (LANE, LANE), staging.dtype)
            return 0
        jax.lax.fori_loop(0, fullb, z, 0)
    if tail:
        staging[slot, pl.ds(off + fullb * LANE, tail), :] = jnp.zeros(
            (tail, LANE), staging.dtype)


def _split_append(halos, dst_off, staging, slot, nrows: int):
    """Split staging[slot, :nrows] into the bf16 halo components at
    halo rows [dst_off, dst_off + nrows) — the one place f32 operand
    rows are decomposed (every later window read is already bf16)."""
    def store(doff, soff, rows):
        x = staging[slot, pl.ds(soff, rows), :]
        if len(halos) == 1:
            halos[0][pl.ds(doff, rows), :] = x.astype(halos[0].dtype)
            return
        xf = x.astype(jnp.float32)
        x0 = xf.astype(jnp.bfloat16)
        halos[0][pl.ds(doff, rows), :] = x0
        r = xf - x0.astype(jnp.float32)
        x1 = r.astype(jnp.bfloat16)
        halos[1][pl.ds(doff, rows), :] = x1
        if len(halos) == 3:
            halos[2][pl.ds(doff, rows), :] = (
                r - x1.astype(jnp.float32)).astype(jnp.bfloat16)

    fullb, tail = nrows // LANE, nrows % LANE
    if fullb:
        def body(t, _):
            store(dst_off + t * LANE, t * LANE, LANE)
            return 0
        jax.lax.fori_loop(0, fullb, body, 0)
    if tail:
        store(dst_off + fullb * LANE, fullb * LANE, tail)


def _roll(halos, span: int, R_T: int):
    """Shift every resident halo down R_T rows: halo[:span] = halo[R_T:].
    128-row chunks in increasing order (each chunk's source is R_T rows
    ahead of its destination, so the overlap is read-before-write)."""
    def shift(t, _):
        for h in halos:
            h[pl.ds(t * LANE, LANE), :] = h[pl.ds(t * LANE + R_T, LANE), :]
        return 0
    jax.lax.fori_loop(0, span // LANE, shift, 0)


def _emit_halo_stream(i, hbm, staging, sems, halos, cfg):
    """One grid step of the rolling-halo machinery: prefetch the next
    staging tile (full or statically-partial at matrix boundaries),
    wait on this step's tile, zero out-of-range rows, roll the resident
    halos and split-append the new rows.  ``cfg`` holds the static
    schedule from :func:`_stage_schedule` / :func:`_init_schedule`."""
    R_T, span, start0 = cfg["R_T"], cfg["span"], cfg["start0"]
    i0f, i1f, boundary = cfg["i0f"], cfg["i1f"], cfg["boundary"]
    LO, chunks, tail0 = cfg["LO"], cfg["chunks"], cfg["tail0"]
    H = R_T + span
    two = jnp.int32(2)  # literal stays int32 under x64
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + 1, two)

    def full_dma(st, buf):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(st * R_T + start0, R_T), :],
            staging.at[buf], sems.at[buf])

    def part_dma(st, buf, zh, lv):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(st * R_T + start0 + zh, lv), :],
            staging.at[buf, pl.ds(zh, lv), :], sems.at[buf])

    @pl.when(i == 0)
    def _():
        if LO:
            _zero_halos(halos, 0, LO)
        for (dst, src, rows) in chunks:
            cp = pltpu.make_async_copy(
                hbm.at[pl.ds(src, rows), :],
                staging.at[0, pl.ds(0, rows), :], sems.at[0])
            cp.start()
            cp.wait()
            _split_append(halos, dst, staging, 0, rows)
        if tail0 < H:
            _zero_halos(halos, tail0, H - tail0)

    # prefetch the NEXT step's rows (overlaps this step's compute)
    if i1f > i0f:
        @pl.when(jnp.logical_and(i + 1 >= i0f, i + 1 < i1f))
        def _():
            full_dma(i + 1, nxt).start()
    for st, (zh, lv) in cfg["boundary"].items():
        if lv:
            @pl.when(i + 1 == st)
            def _(st=st, zh=zh, lv=lv):
                part_dma(st, nxt, zh, lv).start()

    # consume THIS step's rows
    if i1f > i0f:
        @pl.when(jnp.logical_and(i >= i0f, i < i1f))
        def _():
            full_dma(i, slot).wait()
    for st, (zh, lv) in boundary.items():
        if lv:
            @pl.when(i == st)
            def _(st=st, zh=zh, lv=lv):
                part_dma(st, slot, zh, lv).wait()
    for st, (zh, lv) in boundary.items():
        @pl.when(i == st)
        def _(st=st, zh=zh, lv=lv):
            if zh:
                _zero_staging(staging, slot, 0, zh)
            if zh + lv < R_T:
                _zero_staging(staging, slot, zh + lv, R_T - zh - lv)

    @pl.when(i > 0)
    def _():
        if os.environ.get("TSGU_MXU_PERF_VARIANT") != "noroll":
            _roll(halos, span, R_T)
        _split_append(halos, span, staging, slot, R_T)


def _halo_scratch(nsb: int, H: int, staging_dtype, R_T: int,
                  halo_dtype=jnp.bfloat16):
    return ([pltpu.VMEM((H, LANE), halo_dtype) for _ in range(nsb)]
            + [pltpu.VMEM((2, R_T, LANE), staging_dtype),
               pltpu.SemaphoreType.DMA((2,))])


def _fresh_ok(nsb: int, halo_dtype, stream_dtype) -> bool:
    """Fresh-window streaming applies when the source stream needs no
    per-row conversion (one halo whose dtype equals the stream's):
    f32dot mode, bf16 storage, and mixed f32-values x bf16-B.
    ``TSGU_MXU_STREAM=roll`` restores the rolling-halo machinery."""
    return (nsb == 1 and halo_dtype == stream_dtype
            and os.environ.get("TSGU_MXU_STREAM", "fresh") == "fresh")


def _fresh_split_ok(nsb: int, stream_dtype) -> bool:
    """Fresh-window streaming for SPLIT sources (exact-f32 operands,
    nsb bf16 component halos): the window lands f32 by DMA and is
    decomposed ONCE per grid step — no roll copies, no staging shuffle,
    split results reused across every cluster/pass dot.  The round-5
    probes showed the rolling machinery runs serially with compute
    (`empty` 1.243 ms of the 1.953 ms core at cfd2 scale); this keeps
    the split (~0.15 ms of VPU) and deletes the rest.

    Gated by ``TSGU_MXU_FRESH_SPLIT`` until the on-chip probe validates
    it (flips to default-on once measured)."""
    return (nsb > 1 and stream_dtype == jnp.float32
            and os.environ.get("TSGU_MXU_FRESH_SPLIT", "0") == "1"
            and os.environ.get("TSGU_MXU_STREAM", "fresh") == "fresh")


def _fresh_scratch(H: int, halo_dtype):
    return [pltpu.VMEM((2, H, LANE), halo_dtype),
            pltpu.SemaphoreType.DMA((2,))]


def _fresh_split_scratch(nsb: int, H: int):
    return ([pltpu.VMEM((2, H, LANE), jnp.float32)]
            + [pltpu.VMEM((H, LANE), jnp.bfloat16) for _ in range(nsb)]
            + [pltpu.SemaphoreType.DMA((2,))])


def _split_window(halos, win, slot, H: int):
    """Decompose window rows [0, H) of ``win[slot]`` into the bf16
    component halos — one pass per grid step, 128-row chunks."""
    def body(t, _):
        x = win[slot, pl.ds(t * LANE, LANE), :]
        xf = x.astype(jnp.float32)
        x0 = xf.astype(jnp.bfloat16)
        halos[0][pl.ds(t * LANE, LANE), :] = x0
        r = xf - x0.astype(jnp.float32)
        x1 = r.astype(jnp.bfloat16)
        halos[1][pl.ds(t * LANE, LANE), :] = x1
        if len(halos) == 3:
            halos[2][pl.ds(t * LANE, LANE), :] = (
                r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
        return 0
    jax.lax.fori_loop(0, H // LANE, body, 0)


# --------------------------------------------------------------------------
# fresh-window streaming (round 5): the no-roll, no-split source stream
# --------------------------------------------------------------------------
#
# The `empty` probe (round 5, v5e) measured the rolling-halo machinery
# ALONE at 1.243 ms at cfd2 scale — 64 % of the legacy f32 core's
# 1.953 ms, ~12x the 63 MB payload's HBM time.  When the source needs no
# bf16 splitting (f32dot mode, or bf16 storage: one halo whose dtype
# equals the stream's), the whole staging+roll+split pipeline is
# replaced by a double-buffered FULL-window DMA: step i re-reads the
# span-row overlap from HBM (span/R_T = +60 % of B's bytes at cfd2
# geometry — ~0.06 ms) and pays zero VMEM copy traffic.

def _fresh_cfg(R_T: int, span: int, ntiles: int, min_st: int, m: int):
    """Static per-step schedule: window i covers source rows
    [i*R_T + min_st, i*R_T + min_st + H).  Full steps DMA H rows;
    boundary steps DMA the valid middle and zero head/tail."""
    H = R_T + span
    boundary = {}
    full = []
    for i in range(ntiles):
        a = i * R_T + min_st
        lo, hi = max(a, 0), min(a + H, m)
        lv = max(0, hi - lo)
        zh = (lo - a) if lv else 0
        if lv == H:
            full.append(i)
        else:
            boundary[i] = (zh, lv)
    if full:
        i0f, i1f = full[0], full[-1] + 1
        assert full == list(range(i0f, i1f)), "fresh schedule not contiguous"
    else:
        i0f = i1f = 0
    return {"R_T": R_T, "span": span, "H": H, "min_st": min_st,
            "i0f": i0f, "i1f": i1f, "boundary": boundary}


def _emit_fresh_window(i, hbm, win, sems, cfg):
    """One grid step: wait on this step's window DMA (started by the
    previous step or, for i==0, right here), zero its out-of-range rows,
    and prefetch the next step's window into the other buffer."""
    R_T, H, min_st = cfg["R_T"], cfg["H"], cfg["min_st"]
    i0f, i1f, boundary = cfg["i0f"], cfg["i1f"], cfg["boundary"]
    two = jnp.int32(2)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + 1, two)

    def dma(st, buf, zh, lv):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(st * R_T + min_st + zh, lv), :],
            win.at[buf, pl.ds(zh, lv), :], sems.at[buf])

    def start(st, buf):
        if i1f > i0f:
            @pl.when(jnp.logical_and(st >= i0f, st < i1f))
            def _():
                dma(st, buf, 0, H).start()
        for b, (zh, lv) in boundary.items():
            if lv:
                @pl.when(st == b)
                def _(b=b, zh=zh, lv=lv):
                    dma(b, buf, zh, lv).start()

    def wait(st, buf):
        if i1f > i0f:
            @pl.when(jnp.logical_and(st >= i0f, st < i1f))
            def _():
                dma(st, buf, 0, H).wait()
        for b, (zh, lv) in boundary.items():
            if lv:
                @pl.when(st == b)
                def _(b=b, zh=zh, lv=lv):
                    dma(b, buf, zh, lv).wait()

    @pl.when(i == 0)
    def _():
        start(i, slot)
    wait(i, slot)
    # zero out-of-range rows of boundary windows (head before the first
    # source row / tail past the last) — done after the wait so the DMA
    # cannot overwrite the zeros
    for b, (zh, lv) in boundary.items():
        @pl.when(i == b)
        def _(b=b, zh=zh, lv=lv):
            if zh:
                _zero_staging(win, slot, 0, zh)
            if zh + lv < H:
                _zero_staging(win, slot, zh + lv, H - zh - lv)
    start(i + 1, nxt)


def _dma_cfg(R_T, span, ntiles, min_st, m):
    i0f, i1f, boundary = _stage_schedule(ntiles, R_T, min_st + span, m)
    LO, chunks, tail0 = _init_schedule(min_st, R_T + span, R_T, m)
    return {"R_T": R_T, "span": span, "start0": min_st + span,
            "i0f": i0f, "i1f": i1f, "boundary": boundary,
            "LO": LO, "chunks": chunks, "tail0": tail0}


# --------------------------------------------------------------------------
# SpMM
# --------------------------------------------------------------------------

def spmm_core_mxu(offsets: np.ndarray, n: int, m: int, grid_v, B,
                  gv_splits=None):
    """out (n, p) = Σ_k grid_v[:, k] * B[r + off_k, :] via clustered
    banded matmuls over a rolling pre-split source window; returns None
    when the pattern/dtype is out of scope (callers fall back to the
    VPU halo kernel).  ``gv_splits`` may carry the hoisted
    :func:`split_grid_for_mxu` result."""
    K = len(offsets)
    p = B.shape[1]
    if B.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if grid_v.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if p < 64:
        # lane-padding to 128 would amplify the B/out streams >2x; the
        # VPU halo kernel (which keeps narrow tiles) wins below this
        return None
    planned = plan_clusters(offsets)
    if planned is None:
        return None
    clusters, E = planned
    prec = _prec()
    f32dot = (_body_mode() == "f32dot" and grid_v.dtype == jnp.float32
              and B.dtype == jnp.float32)
    nsv = _nsplits(grid_v.dtype, prec)
    nsb = _nsplits(B.dtype, prec)
    halo_dtype = jnp.float32 if f32dot else jnp.bfloat16
    op_dtype = jnp.float32 if f32dot else jnp.bfloat16
    dot_prec = (jax.lax.Precision.HIGHEST if prec == "exact"
                else jax.lax.Precision.HIGH) if f32dot else None
    fresh = _fresh_ok(nsb, halo_dtype, B.dtype)
    fresh_split = not fresh and _fresh_split_ok(nsb, B.dtype)
    geo = _geometry(clusters, E, n, m, nsb, B.dtype.itemsize,
                    n_val_inputs=nsv,
                    halo_item=jnp.dtype(halo_dtype).itemsize, fresh=fresh,
                    fresh_split=fresh_split)
    if geo is None:
        return None
    R_T, span, ntiles, min_st, coffs = geo
    C = len(clusters)
    Wd = E + LANE
    nb = Wd // LANE
    H = R_T + span
    n_pad = ntiles * R_T
    subs = R_T // LANE

    m_eff = m
    if m % 8:
        B = jnp.pad(B, ((0, 8 - m % 8), (0, 0)))
        m_eff = m + 8 - m % 8
    if gv_splits is None or len(gv_splits) != nsv:
        gv_splits = split_f32_components(grid_v, nsv)
    if n_pad != n:
        gv_splits = tuple(jnp.pad(g, ((0, n_pad - n), (0, 0)))
                          for g in gv_splits)
    idx_np = _m_gather_idx(clusters, offsets, E)
    cfg = (_fresh_cfg(R_T, span, ntiles, min_st, m_eff)
           if (fresh or fresh_split)
           else _dma_cfg(R_T, span, ntiles, min_st, m_eff))
    pairs = _pass_pairs(nsv, nsb)

    def kernel(*refs):
        idx_ref = refs[0]
        v_refs = refs[1:1 + nsv]
        b_hbm = refs[1 + nsv]
        out_ref = refs[2 + nsv]
        i = pl.program_id(0)
        if fresh:
            win = refs[3 + nsv]
            sems = refs[4 + nsv]
            _emit_fresh_window(i, b_hbm, win, sems, cfg)
            halos = [win.at[jax.lax.rem(i, jnp.int32(2))]]
        elif fresh_split:
            win = refs[3 + nsv]
            halos = list(refs[4 + nsv:4 + nsv + nsb])
            sems = refs[4 + nsv + nsb]
            _emit_fresh_window(i, b_hbm, win, sems, cfg)
            _split_window(halos, win, jax.lax.rem(i, jnp.int32(2)), H)
        else:
            halos = list(refs[3 + nsv:3 + nsv + nsb])
            staging = refs[3 + nsv + nsb]
            sems = refs[4 + nsv + nsb]
            _emit_halo_stream(i, b_hbm, staging, sems, halos, cfg)
        idx_v = idx_ref[...]

        mode = _body_mode()
        ivs = sorted({iv for iv, _ in pairs})
        jbs = sorted({jb for _, jb in pairs})

        def gather_m(iv, c):
            # gather in 32-bit (Mosaic lane-gather width), then the
            # lossless bf16 narrowing (f32dot keeps f32: Mosaic
            # decomposes inside the HIGHEST-precision dot)
            def g(vt):
                return jnp.concatenate(
                    [jnp.take_along_axis(vt, idx_v[c, b], axis=1)
                     for b in range(nb)], axis=1).astype(op_dtype)
            return g

        # TSGU_MXU_PERF_VARIANT (probe-only, WRONG MATH): 'nogather'
        # replaces the banded-operand lane gathers with a broadcast
        # (keeps the bf16 casts + dots), 'nodot' replaces the MXU
        # contractions with a cheap slice-add (keeps the gathers) —
        # isolates where the core's time over its MXU-pass floor goes.
        variant = os.environ.get("TSGU_MXU_PERF_VARIANT", "none")

        def body(sub, _):
            if variant == "empty":
                # streaming-machinery floor: halo DMA/roll/split only
                out_ref[pl.ds(sub * LANE, LANE), :] = jnp.zeros(
                    (LANE, LANE), out_ref.dtype)
                return 0
            vts = [jnp.pad(vr[pl.ds(sub * LANE, LANE), :],
                           ((0, 0), (0, LANE - K))) for vr in v_refs]
            if mode in ("legacy", "f32dot"):
                acc = jnp.zeros((LANE, LANE), jnp.float32)
                for c in range(C):
                    Ms = {}
                    for (iv, jb) in pairs:
                        if iv not in Ms:
                            if variant == "nogather":
                                Ms[iv] = jnp.broadcast_to(
                                    vts[iv][:, :1], (LANE, Wd)
                                ).astype(op_dtype)
                            else:
                                Ms[iv] = gather_m(iv, c)(vts[iv])  # (128, Wd)
                        woff = 0 if variant == "nowin" else (
                            coffs[c] + sub * LANE)
                        win = halos[jb][pl.ds(woff, Wd), :]
                        if variant == "nodot":
                            acc = acc + Ms[iv][:, :LANE].astype(
                                jnp.float32) + win[:LANE, :].astype(
                                jnp.float32)
                            continue
                        acc = acc + jax.lax.dot_general(
                            Ms[iv], win, _DN_NT,
                            preferred_element_type=jnp.float32,
                            precision=dot_prec)
            elif mode == "pair":
                # one k = C*Wd contraction per pass pair: the C cluster
                # operands concatenate along the contraction axis (M side
                # lands there straight from the gathers; the W side pays
                # one VMEM copy per distinct halo split)
                Mcat = {iv: jnp.concatenate(
                    [gather_m(iv, c)(vts[iv]) for c in range(C)], axis=1)
                    for iv in ivs}                       # (128, C*Wd)
                Wcat = {jb: jnp.concatenate(
                    [halos[jb][pl.ds(coffs[c] + sub * LANE, Wd), :]
                     for c in range(C)], axis=0)
                    for jb in jbs}                       # (C*Wd, 128)
                acc = _tree_sum([jax.lax.dot_general(
                    Mcat[iv], Wcat[jb], _DN_NT,
                    preferred_element_type=jnp.float32)
                    for (iv, jb) in pairs])
            else:  # tree
                # independent dots + balanced-tree combine: no serial
                # acc chain interleaving a VPU add between MXU issues
                Ms = {(iv, c): gather_m(iv, c)(vts[iv])
                      for iv in ivs for c in range(C)}
                acc = _tree_sum([jax.lax.dot_general(
                    Ms[(iv, c)],
                    halos[jb][pl.ds(coffs[c] + sub * LANE, Wd), :],
                    _DN_NT, preferred_element_type=jnp.float32)
                    for (iv, jb) in pairs for c in range(C)])
            out_ref[pl.ds(sub * LANE, LANE), :] = acc.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, subs, body, 0)

    in_specs = ([pl.BlockSpec((C, nb, LANE, LANE), lambda i: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((R_T, K), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * nsv
                + [pl.BlockSpec(memory_space=pl.ANY)])

    @jax.custom_batching.sequential_vmap
    def run(gvs, Bl):
        # sequential under vmap: ANY-space DMA operands cannot be batched
        return pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, LANE), B.dtype),
            scratch_shapes=(_fresh_scratch(H, halo_dtype) if fresh else
                            _fresh_split_scratch(nsb, H) if fresh_split
                            else _halo_scratch(nsb, H, B.dtype, R_T,
                                               halo_dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=_interpret(),
        )(as_device_array(idx_np), *gvs, Bl)

    p_blocks = []
    for jb in range(-(-p // LANE)):
        Bl = B[:, jb * LANE:(jb + 1) * LANE]
        if Bl.shape[1] < LANE:
            Bl = jnp.pad(Bl, ((0, 0), (0, LANE - Bl.shape[1])))
        p_blocks.append(run(gv_splits, Bl)[:n])
    out = p_blocks[0] if len(p_blocks) == 1 else jnp.concatenate(
        p_blocks, axis=1)
    return out[:, :p]


# --------------------------------------------------------------------------
# SDDMM
# --------------------------------------------------------------------------

def sddmm_core_mxu(offsets: np.ndarray, n: int, m: int, X, Y):
    """d_grid (n, K) with d_grid[r, k] = dot(X[r], Y[r + off_k]) via the
    clustered banded-matmul scheme run in reverse: per 128-row sub-tile
    and cluster, ``P = X_tile @ Win_cᵀ`` on the MXU gives every
    (row, window-row) dot at once; static per-lane-block gathers extract
    the K diagonal values.  Returns None out of scope (callers fall
    back)."""
    K = len(offsets)
    p = X.shape[1]
    if X.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if p < 64:
        return None
    planned = plan_clusters(offsets)
    if planned is None:
        return None
    clusters, E = planned
    prec = _prec()
    f32dot = (_body_mode() == "f32dot" and X.dtype == jnp.float32
              and Y.dtype == jnp.float32)
    nsx = _nsplits(X.dtype, prec)
    nsy = _nsplits(Y.dtype, prec)
    halo_dtype = jnp.float32 if f32dot else jnp.bfloat16
    dot_prec = (jax.lax.Precision.HIGHEST if prec == "exact"
                else jax.lax.Precision.HIGH) if f32dot else None
    fresh = _fresh_ok(nsy, halo_dtype, Y.dtype)
    fresh_split = not fresh and _fresh_split_ok(nsy, Y.dtype)
    geo = _geometry(clusters, E, n, m, nsy, Y.dtype.itemsize, n_tables=2,
                    n_val_inputs=1,
                    halo_item=jnp.dtype(halo_dtype).itemsize, fresh=fresh,
                    fresh_split=fresh_split)
    if geo is None:
        return None
    R_T, span, ntiles, min_st, coffs = geo
    C = len(clusters)
    Wd = E + LANE
    nb = Wd // LANE
    H = R_T + span
    n_pad = ntiles * R_T
    subs = R_T // LANE

    m_eff = m
    if m % 8:
        Y = jnp.pad(Y, ((0, 8 - m % 8), (0, 0)))
        m_eff = m + 8 - m % 8
    Xp = X if n_pad == n else jnp.pad(X, ((0, n_pad - n), (0, 0)))
    eidx_np, emsk_np = _p_extract(clusters, offsets, E, K)
    cfg = (_fresh_cfg(R_T, span, ntiles, min_st, m_eff)
           if (fresh or fresh_split)
           else _dma_cfg(R_T, span, ntiles, min_st, m_eff))
    pairs = _pass_pairs(nsx, nsy)

    def kernel(eidx_ref, emsk_ref, x_ref, y_hbm, out_ref, *scratch):
        i = pl.program_id(0)
        if fresh:
            win, sems = scratch[0], scratch[1]
            _emit_fresh_window(i, y_hbm, win, sems, cfg)
            halos = [win.at[jax.lax.rem(i, jnp.int32(2))]]
        elif fresh_split:
            win = scratch[0]
            halos = list(scratch[1:1 + nsy])
            sems = scratch[1 + nsy]
            _emit_fresh_window(i, y_hbm, win, sems, cfg)
            _split_window(halos, win, jax.lax.rem(i, jnp.int32(2)), H)
        else:
            halos = list(scratch[:nsy])
            staging = scratch[nsy]
            sems = scratch[nsy + 1]
            _emit_halo_stream(i, y_hbm, staging, sems, halos, cfg)
        eidx_v = eidx_ref[...]
        emsk_v = emsk_ref[...]

        chained = _body_mode() == "legacy"

        def body(sub, _):
            xt = x_ref[pl.ds(sub * LANE, LANE), :]
            xts = (xt,) if f32dot else split_bf16(xt, nsx)
            parts = []
            for c in range(C):
                win = [halos[jb][pl.ds(coffs[c] + sub * LANE, Wd), :]
                       for jb in range(nsy)]
                # independent dots + tree combine (see the SpMM body):
                # the per-pair P accumulation and the per-block masked
                # extraction adds otherwise chain a VPU op between
                # consecutive MXU issues
                P = _tree_sum([jax.lax.dot_general(
                    xts[ix], win[jy], _DN_TT,
                    preferred_element_type=jnp.float32,
                    precision=dot_prec)                       # (128, Wd)
                    for (ix, jy) in pairs])
                for b in range(nb):
                    got = jnp.take_along_axis(
                        P[:, b * LANE:(b + 1) * LANE], eidx_v[c, b], axis=1)
                    parts.append(got * emsk_v[c, b])
            acc = (sum(parts[1:], parts[0]) if chained
                   else _tree_sum(parts))
            out_ref[pl.ds(sub * LANE, LANE), :] = acc[:, :K].astype(
                out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, subs, body, 0)

    @jax.custom_batching.sequential_vmap
    def run(Xl, Yl):
        # sequential under vmap: ANY-space DMA operands cannot be batched
        return pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((C, nb, LANE, LANE), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, nb, LANE, LANE), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((R_T, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, K), X.dtype),
            scratch_shapes=(_fresh_scratch(H, halo_dtype) if fresh else
                            _fresh_split_scratch(nsy, H) if fresh_split
                            else _halo_scratch(nsy, H, Y.dtype, R_T,
                                               halo_dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=_interpret(),
        )(as_device_array(eidx_np), as_device_array(emsk_np), Xl, Yl)

    acc = None
    for jb in range(-(-p // LANE)):
        Xl = Xp[:, jb * LANE:(jb + 1) * LANE]
        Yl = Y[:, jb * LANE:(jb + 1) * LANE]
        if Xl.shape[1] < LANE:
            Xl = jnp.pad(Xl, ((0, 0), (0, LANE - Xl.shape[1])))
            Yl = jnp.pad(Yl, ((0, 0), (0, LANE - Yl.shape[1])))
        part = run(Xl, Yl)
        acc = part if acc is None else acc + part
    return acc[:n]
