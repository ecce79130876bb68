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
from typing import Tuple

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


@dataclass
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
    W = W_max
    return ShardedChunkPlan(
        n=n, m=m, n_shards=n_shards, rows_per_shard=rps, C=C, SB=SB,
        nchunks=nchunks, W=W, lr=lr,
        seg_rows=np.ascontiguousarray(seg[:, :, :W]), gather_idx=gidx,
        entry_sel=esel)


def sharded_chunk_spmm(plan: ShardedChunkPlan, data, B, mesh: Mesh,
                       axis: str):
    """``A @ B`` with A row-sharded over ``axis`` and each shard's SpMM
    executed by the Pallas chunk kernel.  B is replicated; the output rows
    are sharded over ``axis``.  Forward-only building block (wrap with the
    library's custom-VJP ops for gradients, or differentiate through —
    the kernel sits behind the same fused-backward machinery when used via
    ``sparse_mm``; this entry point targets inference/forward pipelines)."""
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
