"""Fully sharded DIA SpMM: stencil operators across a device mesh with
ICI halo exchange.

``sharded_sparse_mm`` (sharding.py) row-shards A but replicates the dense
operand — every device holds all of B, so the reachable problem size is
one chip's HBM.  For diagonal-structured patterns (stencil/FEM operators,
banded factors — the DIA engine's class) the column support of a row
block is a *bounded window*, so B can be row-sharded too: each device
owns matching row slabs of A, B, and the output, and the only
communication is a **boundary-strip exchange with the two mesh
neighbours** (`jax.lax.ppermute` over ICI), exactly the classic
stencil-parallel decomposition.

Everything inside the ``shard_map`` is plain differentiable XLA (the
K-offset shifted-slice core), so the backward — including the *reverse*
halo exchange that reduces boundary gradient strips back to their owner
shards — falls out of JAX's transpose rules for ``ppermute``/``slice``;
no hand-written collectives, matching the scaling-book recipe.

The reference has no distributed anything (SURVEY §5); this is the
TPU-native answer to "the matrix no longer fits one device", for the
pattern class where that actually happens (large 3-D stencils).

Example (run on an 8-device mesh)::

    mesh = jax.make_mesh((8,), ("row",))
    f = sharded_dia_spmm(A, mesh, "row")       # A: stencil SparseCSR
    y = f(A.data, B)                            # B, y row-sharded

``matvec_closures`` adapts the same machinery to the Krylov solvers'
``(mv, mv_t)`` interface, giving a distributed CG/MINRES for SPD stencil
systems.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.dia import build_dia_plan, values_to_grid
from ..types import is_sparse

__all__ = ["sharded_dia_spmm", "matvec_closures"]


def _plan_or_raise(A):
    if not is_sparse(A) or A.ndim != 2:
        raise ValueError("sharded_dia_spmm expects an unbatched 2-D sparse "
                         "container")
    n, m = A.shape
    if n != m:
        raise ValueError("sharded_dia_spmm expects a square operator "
                         f"(got {A.shape}); rectangular operators use "
                         "sharded_sparse_mm")
    rs, cs = A.row_sa(), A.col_sa()
    if rs is None:
        raise ValueError("sharded_dia_spmm needs a static pattern")
    plan = build_dia_plan(rs, cs, n, m)
    if plan is None or plan.is_hybrid:
        raise ValueError(
            "sharded_dia_spmm: pattern is not pure-DIA (union of <=256 "
            "diagonals with no residual entries); use sharded_sparse_mm")
    return plan


def _geometry(plan, n_shards: int) -> Tuple[int, int, int]:
    n = plan.n
    rps = -(-n // n_shards)
    if rps % 8:
        rps = -(-rps // 8) * 8           # sublane-aligned slabs
    h_lo = max(0, -int(plan.offsets.min()))
    h_hi = max(0, int(plan.offsets.max()))
    if max(h_lo, h_hi) > rps:
        raise ValueError(
            f"sharded_dia_spmm: halo ({max(h_lo, h_hi)} rows) exceeds the "
            f"per-shard slab ({rps} rows); use fewer shards")
    return rps, h_lo, h_hi


def sharded_dia_spmm(A, mesh: Mesh, axis: str) -> Callable:
    """Build ``f(data, B) -> A@B`` with A's value grid, B, and the output
    all row-sharded over mesh axis ``axis``.

    ``data``: A's (nnz,) values (global CSR order — the grid relayout and
    its VJP run once, outside the mapped region).  ``B``: global ``(n, p)``
    (place it with ``NamedSharding(mesh, P(axis, None))``; a replicated B
    works too — XLA reshards).  Forward communication: two neighbour
    ``ppermute`` strips of ``h`` rows each; backward: their transposes.
    """
    plan = _plan_or_raise(A)
    S = mesh.shape[axis]
    rps, h_lo, h_hi = _geometry(plan, S)
    n = plan.n
    n_pad = rps * S
    offsets = [int(o) for o in plan.offsets]
    fwd_perm = [(i, i + 1) for i in range(S - 1)]   # send down: halo-up rows
    bwd_perm = [(i + 1, i) for i in range(S - 1)]   # send up: halo-down rows

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(axis))
    def run(grid_loc, B_loc):
        g = grid_loc[0] if grid_loc.ndim == 3 else grid_loc
        Bl = B_loc if B_loc.ndim == 2 else B_loc[0]
        p = Bl.shape[1]
        parts = []
        if h_lo:
            # rows [s*rps - h_lo, s*rps): the slab above's last h_lo rows
            up = jax.lax.ppermute(Bl[rps - h_lo:], axis, fwd_perm)
            parts.append(up)
        parts.append(Bl)
        if h_hi:
            dn = jax.lax.ppermute(Bl[:h_hi], axis, bwd_perm)
            parts.append(dn)
        Bwin = jnp.concatenate(parts) if len(parts) > 1 else Bl
        out = jnp.zeros((rps, p), Bl.dtype)
        for k, off in enumerate(offsets):
            s = off + h_lo                     # static slice start
            out = out + g[:, k:k + 1] * jax.lax.slice_in_dim(
                Bwin, s, s + rps, axis=0)
        return out[None] if grid_loc.ndim == 3 else out

    def f(data, B):
        grid = values_to_grid(plan, data)                  # (n, K), diff'able
        if n_pad != n:
            grid = jnp.pad(grid, ((0, n_pad - n), (0, 0)))
            B = jnp.pad(B, ((0, n_pad - B.shape[0]), (0, 0)))
        out = run(grid, B)
        return out[:n]

    f.rows_per_shard = rps
    f.halo = (h_lo, h_hi)
    f.n_padded = n_pad
    return f


def matvec_closures(A, mesh: Mesh, axis: str):
    """``(mv, mv_t)`` closures over :func:`sharded_dia_spmm` for the
    Krylov drivers (``linear_cg(mv, ..)``, ``sparse_generic_solve(...,
    transpose_matvec=mv_t)``): a distributed solver for stencil systems.
    The operator values are closed over; x/rhs are ``(n, p)`` (or ``(n,)``,
    promoted)."""
    At = A.T
    f = sharded_dia_spmm(A, mesh, axis)
    fT = sharded_dia_spmm(At, mesh, axis)

    def _wrap(g, M):
        def mv(x):
            squeeze = x.ndim == 1
            xm = x[:, None] if squeeze else x
            y = g(M.data, xm)
            return y[:, 0] if squeeze else y
        return mv

    return _wrap(f, A), _wrap(fT, At)
