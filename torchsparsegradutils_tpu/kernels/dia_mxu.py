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
3. One MXU contraction per cluster:
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
5. f32 inputs run the exact **bf16x6 decomposition** (3-way splits;
   bf16 products are exact in f32, so the result matches an f32
   matmul); bf16 inputs take a single pass.

The reference runs these patterns through generic CUDA gather kernels
(sparse_matmul.py:155); the banded-matmul formulation has no reference
analogue — it exists because the TPU's MXU is the only unit that can
"gather" at full rate, via structured banded operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import as_device_array

LANE = 128
MAX_CLUSTERS = 6
VMEM_BUDGET = 12 * 1024 * 1024
DUMMY = LANE - 1          # zeroed pad lane of the value tile


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


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


def _geometry(clusters, E: int, n: int, m: int, n_tables: int = 1):
    """Rolling-window geometry: tile size, halo span, padding.  Tile i's
    halo holds padded-B rows ``[i*R_T + base0, i*R_T + base0 + H)``;
    cluster c's window for sub-tile ``s`` starts ``coff_c + 128*s`` rows
    into the halo.  ``n_tables`` counts the resident (C, nb, 128, 128)
    static tables: 1 for SpMM (gather index), 2 for SDDMM (extract index
    + mask) — undercounting them lets Mosaic OOM at compile time."""
    C = len(clusters)
    starts = [st for st, _ in clusters]
    min_st, max_st = min(starts), max(starts)
    span = -(-(max_st + E - min_st) // LANE) * LANE
    nb = E // LANE + 1
    for R_T in (4096, 2048, 1024, 512, 256, 128):
        H = R_T + span
        vmem = (H * LANE * 4              # halo
                + 2 * R_T * LANE * 4      # staging double buffer
                + 2 * R_T * LANE * 4      # v/x tile + out tile (phys pad)
                + n_tables * C * nb * LANE * LANE * 4)
        if vmem <= VMEM_BUDGET or R_T == 128:
            break
    ntiles = -(-n // R_T)
    LO = max(0, -min_st)
    base0 = min_st + LO
    hi_pad = max(0, (ntiles - 1) * R_T + base0 + R_T + span - (LO + m))
    coffs = [st - min_st for st in starts]
    return R_T, span, ntiles, LO, base0, hi_pad, coffs


def _split3(a):
    """f32 -> (a0, a1, a2) bf16 with a ~= a0 + a1 + a2 to ~2^-27."""
    a0 = a.astype(jnp.bfloat16)
    r = a - a0.astype(jnp.float32)
    a1 = r.astype(jnp.bfloat16)
    a2 = (r - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    return a0, a1, a2


def _split3_dot(A, B, dn):
    """dot_general with dimension numbers ``dn``; f32 operands take the
    standard bf16x6 decomposition (3-way splits, the 6 product terms
    down to 2^-18; the same scheme XLA uses for Precision.HIGHEST) —
    bf16xbf16 products are exact in f32, so the result matches an f32
    matmul.  A 2-way/4-pass split is NOT enough: it drops ~2^-18
    relative per product, which breaks the library's 1e-5 dense-parity
    contract.  bf16 inputs take a single pass."""
    def d(a, b):
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32)
    if A.dtype == jnp.bfloat16 and B.dtype == jnp.bfloat16:
        return d(A, B)
    A0, A1, A2 = _split3(A.astype(jnp.float32))
    B0, B1, B2 = _split3(B.astype(jnp.float32))
    return (d(A0, B2) + d(A1, B1) + d(A2, B0)) + \
        (d(A0, B1) + d(A1, B0)) + d(A0, B0)


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


def _roll_and_fill(halo, staging, slot, span: int, R_T: int):
    """Shift the resident window down R_T rows and append the staged
    rows: ``halo[:span] = halo[R_T:]; halo[span:] = staging[slot]``.
    128-row chunks in increasing order (each chunk's source is R_T rows
    ahead of its destination, so the overlap is read-before-write)."""
    def shift(t, _):
        halo[pl.ds(t * LANE, LANE), :] = halo[pl.ds(t * LANE + R_T, LANE), :]
        return 0
    jax.lax.fori_loop(0, span // LANE, shift, 0)

    def fill(t, _):
        halo[pl.ds(span + t * LANE, LANE), :] = staging[slot,
                                                        pl.ds(t * LANE, LANE), :]
        return 0
    jax.lax.fori_loop(0, R_T // LANE, fill, 0)


def spmm_core_mxu(offsets: np.ndarray, n: int, m: int, grid_v, B):
    """out (n, p) = Σ_k grid_v[:, k] * B[r + off_k, :] via clustered
    banded matmuls over a rolling source window; returns None when the
    pattern/dtype is out of scope (callers fall back to the VPU halo
    kernel)."""
    K = len(offsets)
    p = B.shape[1]
    if B.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if p < 64:
        # lane-padding to 128 would amplify the B/out streams >2x; the
        # VPU halo kernel (which keeps narrow tiles) wins below this
        return None
    planned = plan_clusters(offsets)
    if planned is None:
        return None
    clusters, E = planned
    C = len(clusters)
    Wd = E + LANE
    nb = Wd // LANE
    R_T, span, ntiles, LO, base0, hi_pad, coffs = _geometry(clusters, E, n, m)
    H = R_T + span
    n_pad = ntiles * R_T
    subs = R_T // LANE

    if LO or hi_pad:
        B = jnp.pad(B, ((LO, hi_pad), (0, 0)))
    gv = grid_v if n_pad == n else jnp.pad(grid_v, ((0, n_pad - n), (0, 0)))
    idx_np = _m_gather_idx(clusters, offsets, E)

    def kernel(idx_ref, v_ref, b_hbm, out_ref, halo, staging, sems):
        i = pl.program_id(0)
        two = jnp.int32(2)
        slot = jax.lax.rem(i, two)
        nxt = jax.lax.rem(i + 1, two)

        def stage_dma(st, buf):
            return pltpu.make_async_copy(
                b_hbm.at[pl.ds(st * R_T + base0 + span, R_T), :],
                staging.at[buf], sems.at[buf])

        @pl.when(i + 1 < pl.num_programs(0))
        def _():
            stage_dma(i + 1, nxt).start()

        @pl.when(i == 0)
        def _():
            big = pltpu.make_async_copy(
                b_hbm.at[pl.ds(base0, H), :], halo, sems.at[0])
            big.start()
            big.wait()

        @pl.when(i > 0)
        def _():
            stage_dma(i, slot).wait()
            _roll_and_fill(halo, staging, slot, span, R_T)

        idx_v = idx_ref[...]

        def body(sub, _):
            vt = v_ref[pl.ds(sub * LANE, LANE), :].astype(jnp.float32)
            vt_pad = jnp.pad(vt, ((0, 0), (0, LANE - K)))
            acc = jnp.zeros((LANE, LANE), jnp.float32)
            for c in range(C):
                M = jnp.concatenate(
                    [jnp.take_along_axis(vt_pad, idx_v[c, b], axis=1)
                     for b in range(nb)], axis=1)          # (128, Wd)
                win = halo[pl.ds(coffs[c] + sub * LANE, Wd), :]
                acc = acc + _split3_dot(M, win, _DN_NT)
            out_ref[pl.ds(sub * LANE, LANE), :] = acc.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, subs, body, 0)

    @jax.custom_batching.sequential_vmap
    def run(gv, Bl):
        # sequential under vmap: ANY-space DMA operands cannot be batched
        return pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((C, nb, LANE, LANE), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R_T, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, LANE), B.dtype),
            scratch_shapes=[
                pltpu.VMEM((H, LANE), B.dtype),
                pltpu.VMEM((2, R_T, LANE), B.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=_interpret(),
        )(as_device_array(idx_np), gv, Bl)

    p_blocks = []
    for jb in range(-(-p // LANE)):
        Bl = B[:, jb * LANE:(jb + 1) * LANE]
        if Bl.shape[1] < LANE:
            Bl = jnp.pad(Bl, ((0, 0), (0, LANE - Bl.shape[1])))
        p_blocks.append(run(gv, Bl)[:n])
    out = p_blocks[0] if len(p_blocks) == 1 else jnp.concatenate(
        p_blocks, axis=1)
    return out[:, :p]


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
    C = len(clusters)
    Wd = E + LANE
    nb = Wd // LANE
    R_T, span, ntiles, LO, base0, hi_pad, coffs = _geometry(
        clusters, E, n, m, n_tables=2)
    H = R_T + span
    n_pad = ntiles * R_T
    subs = R_T // LANE

    if LO or hi_pad:
        Y = jnp.pad(Y, ((LO, hi_pad), (0, 0)))
    Xp = X if n_pad == n else jnp.pad(X, ((0, n_pad - n), (0, 0)))
    eidx_np, emsk_np = _p_extract(clusters, offsets, E, K)

    def kernel(eidx_ref, emsk_ref, x_ref, y_hbm, out_ref, halo, staging,
               sems):
        i = pl.program_id(0)
        two = jnp.int32(2)
        slot = jax.lax.rem(i, two)
        nxt = jax.lax.rem(i + 1, two)

        def stage_dma(st, buf):
            return pltpu.make_async_copy(
                y_hbm.at[pl.ds(st * R_T + base0 + span, R_T), :],
                staging.at[buf], sems.at[buf])

        @pl.when(i + 1 < pl.num_programs(0))
        def _():
            stage_dma(i + 1, nxt).start()

        @pl.when(i == 0)
        def _():
            big = pltpu.make_async_copy(
                y_hbm.at[pl.ds(base0, H), :], halo, sems.at[0])
            big.start()
            big.wait()

        @pl.when(i > 0)
        def _():
            stage_dma(i, slot).wait()
            _roll_and_fill(halo, staging, slot, span, R_T)

        eidx_v = eidx_ref[...]
        emsk_v = emsk_ref[...]

        def body(sub, _):
            xt = x_ref[pl.ds(sub * LANE, LANE), :]
            acc = jnp.zeros((LANE, LANE), jnp.float32)
            for c in range(C):
                win = halo[pl.ds(coffs[c] + sub * LANE, Wd), :]
                P = _split3_dot(xt, win, _DN_TT)            # (128, Wd)
                for b in range(nb):
                    got = jnp.take_along_axis(
                        P[:, b * LANE:(b + 1) * LANE], eidx_v[c, b], axis=1)
                    acc = acc + got * emsk_v[c, b]
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
            scratch_shapes=[
                pltpu.VMEM((H, LANE), Y.dtype),
                pltpu.VMEM((2, R_T, LANE), Y.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
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
