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

__all__ = ["RowShardedMatrix", "local_shard_spmm", "shard_rows",
           "sharded_sparse_mm"]


def local_shard_spmm(local_rows, cols, data_local, B, rps: int):
    """This device's row-slab SpMM, for use *inside* ``shard_map``.

    Builds the slab as a dynamic-pattern container and runs the library's
    ``sparse_mm`` — so the multi-chip path and the single-chip op stack
    are one system: the custom VJP returns the sparse gradient at the
    slab's stored nonzeros and the ``gradB = Aᵀ_loc G`` term, whose
    cross-shard reduction the enclosing ``shard_map`` transposes into a
    ``psum`` automatically.

    Args:
      local_rows / cols / data_local: (nnz_local,) traced slab arrays
        (padding entries must carry zero values).
      B: replicated dense ``(m, p)``.
      rps: rows per shard (static).
    """
    from ..ops.spmm import sparse_mm
    from ..types import SparseCOO

    A_loc = SparseCOO(local_rows, cols, data_local, (rps, B.shape[0]),
                      pattern_static=False)
    return sparse_mm(A_loc, B)


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
    mask: np.ndarray = None  # (S, nnzs) False on padding entries

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
                            n_shards=n_shards, mask=mask)


def sharded_sparse_mm(M: RowShardedMatrix, B, mesh: Mesh, axis: str,
                      out_padded: bool = False):
    """``A @ B`` with A row-sharded over mesh axis ``axis``, B replicated.

    Returns a global ``(n, p)`` array whose rows are sharded over ``axis``
    (``(padded_rows, p)`` if ``out_padded``).  Forward needs no
    communication; gradients w.r.t. B are reduced by an XLA-inserted psum.
    """
    rps = M.rows_per_shard

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
             out_specs=P(axis), check_vma=False)  # custom-VJP inside: the
    # replication checker cannot see through it (grad values are covered
    # by tests/test_parallel.py against the dense reference)
    def run(local_rows, cols, data, mask, B):
        lr, c, d = local_rows[0], cols[0], data[0]
        # mask padding entries so they carry no value and receive no grad
        d = jnp.where(mask[0], d, 0.0)
        return local_shard_spmm(lr, c, d, B, rps)[None]

    mask = (np.ones_like(M.local_rows, bool) if M.mask is None else M.mask)
    out = run(jnp.asarray(M.local_rows), jnp.asarray(M.cols), M.data,
              jnp.asarray(mask), B)
    out = out.reshape(M.padded_rows, -1)
    return out if out_padded else out[:M.shape[0]]
