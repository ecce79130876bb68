"""Multi-chip SpMM running the Pallas chunk kernel on every shard.

Composition of the two performance layers: the row-block sharding of
:mod:`.sharding` (each device owns a contiguous row slab; B replicated;
zero-communication forward) with the chunk kernel of
:mod:`..kernels.chunk_spmm` executing the per-shard SpMM on the MXU.

Because ``shard_map`` runs one identical program on every device, the
per-shard plan tables (chunk ranks, gather indices, segment rows) are
padded host-side to common shapes and passed as **sharded array operands**
rather than captured constants — each device reads its own slab's tables.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.chunk_spmm import HI, LANE, interpret_mode
from ..types import as_device_array, is_sparse

__all__ = ["ShardedChunkPlan", "build_sharded_chunk_plan",
           "sharded_chunk_spmm"]


@dataclass(eq=False)          # id-hashable: usable as a nondiff VJP arg
class ShardedChunkPlan:
    """Per-shard chunk tables padded to common shapes (leading shard dim)."""
    n: int
    m: int
    n_shards: int
    rows_per_shard: int
    C: int
    SB: int
    nchunks: int           # common (max) chunks per shard
    W: int                 # common (max) distinct rows per chunk
    lr: np.ndarray         # (S, nchunks, C) local row rank (sentinel W)
    seg_rows: np.ndarray   # (S, nchunks, W) local row per rank (sentinel rps)
    gather_idx: np.ndarray  # (S, nchunks*C) B-row per entry (0 on padding)
    entry_sel: np.ndarray  # (S, nchunks*C) index into data (nnz on padding)
    entry_rows: np.ndarray  # (S, nchunks*C) local row per entry (rps on pad)
    nnz: int = 0


def build_sharded_chunk_plan(A, n_shards: int, C: int = 512,
                             SB: int = 8) -> ShardedChunkPlan:
    """Host-side partition of a 2-D row-sorted container into per-shard
    chunk tables (contiguous row slabs, equal padded shapes)."""
    if not is_sparse(A) or A.ndim != 2:
        raise ValueError("expected an unbatched 2-D sparse container")
    rows = A.rows_np("sharded chunk plan").astype(np.int64)
    cols = A.cols_np("sharded chunk plan").astype(np.int64)
    if len(rows) and not (np.diff(rows) >= 0).all():
        raise ValueError("entries must be sorted by row (CSR order)")
    n, m = A.shape
    nnz = len(rows)
    rps = -(-n // n_shards)

    # shard boundaries in the entry stream (contiguous: rows sorted)
    bounds = np.searchsorted(rows, np.arange(n_shards + 1) * rps)
    per = np.diff(bounds)
    nchunks = max(-(-int(per.max()) // C), 1)
    nchunks = -(-nchunks // SB) * SB
    npad = nchunks * C

    from .. import native
    lr = np.full((n_shards, nchunks, C), 0, np.int32)
    seg = np.full((n_shards, nchunks, C), rps, np.int32)  # W trimmed later
    gidx = np.zeros((n_shards, npad), np.int32)
    esel = np.full((n_shards, npad), nnz, np.int32)
    erows = np.full((n_shards, npad), rps, np.int32)
    W_max = 8
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        k = hi - lo
        r_loc = np.concatenate([
            rows[lo:hi] - s * rps,
            np.full(npad - k, rps - 1 if k == 0 else rows[hi - 1] - s * rps,
                    np.int64)])
        ranked = native.chunk_ranks(r_loc, C, rps, W_cap=C)
        lr_s, seg_s, W_s = ranked
        W_max = max(W_max, -(-W_s // 8) * 8)
        lr[s] = lr_s
        seg[s, :, :seg_s.shape[1]] = seg_s
        gidx[s, :k] = cols[lo:hi]
        esel[s, :k] = np.arange(lo, hi, dtype=np.int32)
        erows[s, :k] = (rows[lo:hi] - s * rps).astype(np.int32)
    W = W_max
    return ShardedChunkPlan(
        n=n, m=m, n_shards=n_shards, rows_per_shard=rps, C=C, SB=SB,
        nchunks=nchunks, W=W, lr=lr,
        seg_rows=np.ascontiguousarray(seg[:, :, :W]), gather_idx=gidx,
        entry_sel=esel, entry_rows=erows, nnz=nnz)


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def sharded_chunk_spmm(plan: ShardedChunkPlan, data, B, mesh: Mesh,
                       axis: str):
    """``A @ B`` with A row-sharded over ``axis`` and each shard's SpMM
    executed by the Pallas chunk kernel.  B is replicated; the output rows
    are sharded over ``axis``.

    Differentiable: the custom VJP computes the sparse gradient of A
    *only at each shard's stored nonzeros* (local SDDMM per shard,
    scattered back to the canonical nnz order) and
    ``gradB = Σ_shards Aᵀ_s G_s`` via an explicit ``psum`` over ``axis``
    — the sharded mirror of ``sparse_mm``'s backward contract."""
    return _sharded_chunk_fwd(plan, data, B, mesh, axis)


def _sharded_chunk_fwd(plan: ShardedChunkPlan, data, B, mesh: Mesh,
                       axis: str):
    C, SB, W, nch = plan.C, plan.SB, plan.W, plan.nchunks
    rps = plan.rows_per_shard
    p = B.shape[1]
    p_pad = -(-p // LANE) * LANE
    if p_pad != p:
        B = jnp.pad(B, ((0, 0), (0, p_pad - p)))
    data_ext = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
    # per-shard values in slab order (monotone static gather)
    vals_sh = jnp.take(data_ext, as_device_array(plan.entry_sel))

    def kernel(lr_ref, vals_ref, pg_ref, out_ref):
        for i in range(SB):
            l = lr_ref[i]
            v = vals_ref[i]
            M = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (W, C), 0) == l[None, :],
                v[None, :], 0.0)
            out_ref[i] = jnp.dot(M, pg_ref[i * C:(i + 1) * C, :],
                                 preferred_element_type=jnp.float32,
                                 precision=HI).astype(out_ref.dtype)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
             out_specs=P(axis), check_vma=False)  # pallas_call lacks vma
    def run(lr, seg_rows, gidx, vals, B):
        lr, seg_rows, gidx, vals = lr[0], seg_rows[0], gidx[0], vals[0]
        Pg = jnp.take(B, gidx, axis=0)
        partial_out = pl.pallas_call(
            kernel, grid=(nch // SB, p_pad // LANE),
            in_specs=[
                pl.BlockSpec((SB, C), lambda s, j: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SB, C), lambda s, j: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SB * C, LANE), lambda s, j: (s, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SB, W, LANE), lambda s, j: (s, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nch, W, p_pad), B.dtype),
            interpret=interpret_mode(),
        )(lr, vals.reshape(nch, C), Pg)
        out = jax.ops.segment_sum(partial_out.reshape(-1, p_pad),
                                  seg_rows.reshape(-1),
                                  num_segments=rps + 1)[:rps]
        return out[None]

    out = run(as_device_array(plan.lr), as_device_array(plan.seg_rows),
              as_device_array(plan.gather_idx), vals_sh, B)
    return out.reshape(plan.n_shards * rps, p_pad)[:plan.n, :p]


def _scs_fwd(plan, data, B, mesh, axis):
    return _sharded_chunk_fwd(plan, data, B, mesh, axis), (data, B)


def _scs_bwd(plan, mesh, axis, res, g):
    data, B = res
    rps, m, S = plan.rows_per_shard, plan.m, plan.n_shards
    p = B.shape[1]
    g_pad = jnp.pad(g[:, :p], ((0, S * rps - plan.n), (0, 0)))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(), P()),
             out_specs=(P(axis), P()))
    def run_bwd(gidx, esel, erows, data, g_pad):
        gidx_l, esel_l, erows_l = gidx[0], esel[0], erows[0]
        shard = jax.lax.axis_index(axis)
        g_loc = jax.lax.dynamic_slice_in_dim(g_pad, shard * rps, rps)
        g1 = jnp.concatenate([g_loc, jnp.zeros((1, p), g_loc.dtype)])
        data_ext = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        vals = jnp.take(data_ext, esel_l)
        ge = jnp.take(g1, erows_l, axis=0)            # (npad, p)
        # local SDDMM at the shard's nonzeros
        dv = (ge * jnp.take(B, gidx_l, axis=0)).sum(-1)
        # local A^T g, reduced across shards
        dB = jax.ops.segment_sum(vals[:, None] * ge, gidx_l,
                                 num_segments=m)
        return dv[None], jax.lax.psum(dB, axis)

    dv, dB = run_bwd(as_device_array(plan.gather_idx),
                     as_device_array(plan.entry_sel),
                     as_device_array(plan.entry_rows), data, g_pad)
    d_data = jnp.zeros((plan.nnz + 1,), data.dtype).at[
        as_device_array(plan.entry_sel).reshape(-1)].add(
        dv.reshape(-1))[:plan.nnz]
    return d_data, dB


sharded_chunk_spmm.defvjp(_scs_fwd, _scs_bwd)
