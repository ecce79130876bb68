"""Multi-chip sharding for sparse operators.

The reference library is single-device (SURVEY §5: no distributed backend);
the TPU-native extension of its scaling axis ("bigger nnz / event dim") is
**row-block sharding of the sparse operand over a device mesh**: each device
owns a contiguous slab of rows (equal padded nnz per shard — static
shapes), the dense RHS is replicated (or column-sharded), and the output
rows live where their matrix rows live.  Collectives come from XLA via
``shard_map`` — no communication code, only shardings (scaling-book
recipe).

Layout:
  * ``RowShardedMatrix`` — host-side partitioner output: per-shard local
    row / column / data arrays with a leading ``(n_shards,)`` axis to place
    on a mesh axis.
  * ``sharded_sparse_mm`` — SpMM with A row-sharded and B replicated:
    zero communication in the forward (each shard computes its own output
    rows); the backward's ``gradB = Aᵀ G`` induces a ``psum`` which XLA
    inserts automatically.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..types import is_sparse

__all__ = ["RowShardedMatrix", "shard_rows", "sharded_sparse_mm"]


@dataclass
class RowShardedMatrix:
    """Row-block-sharded sparse matrix: shard i owns rows
    ``[i*rows_per_shard, (i+1)*rows_per_shard)`` (zero-padded)."""

    local_rows: np.ndarray   # (S, nnzs) row index local to the shard
    cols: np.ndarray         # (S, nnzs) global column index
    data: jax.Array          # (S, nnzs) values (padding entries are 0)
    shape: Tuple[int, int]
    rows_per_shard: int
    n_shards: int

    @property
    def padded_rows(self) -> int:
        return self.rows_per_shard * self.n_shards


def shard_rows(A, n_shards: int) -> RowShardedMatrix:
    """Partition a 2-D sparse container into row blocks (host-side).

    Every shard is padded to the max per-shard nnz with zero-valued entries
    at its local (0, 0), keeping shapes static and uniform across devices.
    """
    if not is_sparse(A) or A.ndim != 2:
        raise ValueError("shard_rows expects an unbatched 2-D sparse "
                         "container")
    n, m = A.shape
    rows = A.rows_np("shard_rows").astype(np.int64)
    cols = A.cols_np("shard_rows").astype(np.int64)
    rps = -(-n // n_shards)
    shard_of = rows // rps
    nnz_per = np.bincount(shard_of, minlength=n_shards)
    nnzs = max(int(nnz_per.max()), 1)

    local_rows = np.zeros((n_shards, nnzs), np.int32)
    g_cols = np.zeros((n_shards, nnzs), np.int32)
    sel = np.zeros((n_shards, nnzs), np.int64)
    mask = np.zeros((n_shards, nnzs), bool)
    order = np.argsort(shard_of, kind="stable")
    offs = np.zeros(n_shards + 1, np.int64)
    np.cumsum(nnz_per, out=offs[1:])
    for s in range(n_shards):
        idx = order[offs[s]:offs[s + 1]]
        k = len(idx)
        local_rows[s, :k] = rows[idx] - s * rps
        g_cols[s, :k] = cols[idx]
        sel[s, :k] = idx
        mask[s, :k] = True
    data = jnp.where(jnp.asarray(mask),
                     jnp.take(A.data, jnp.asarray(sel.reshape(-1))
                              ).reshape(n_shards, nnzs), 0.0)
    return RowShardedMatrix(local_rows=local_rows, cols=g_cols, data=data,
                            shape=(n, m), rows_per_shard=rps,
                            n_shards=n_shards)


def sharded_sparse_mm(M: RowShardedMatrix, B, mesh: Mesh, axis: str,
                      out_padded: bool = False):
    """``A @ B`` with A row-sharded over mesh axis ``axis``, B replicated.

    Returns a global ``(n, p)`` array whose rows are sharded over ``axis``
    (``(padded_rows, p)`` if ``out_padded``).  Forward needs no
    communication; gradients w.r.t. B are reduced by an XLA-inserted psum.
    """
    rps = M.rows_per_shard

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P()),
             out_specs=P(axis))
    def run(local_rows, cols, data, B):
        lr, c, d = local_rows[0], cols[0], data[0]
        prod = d[:, None] * jnp.take(B, c, axis=0)
        return jax.ops.segment_sum(prod, lr, num_segments=rps)[None]

    out = run(jnp.asarray(M.local_rows), jnp.asarray(M.cols), M.data, B)
    out = out.reshape(M.padded_rows, -1)
    return out if out_padded else out[:M.shape[0]]
