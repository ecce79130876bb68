"""3-stage static permutation (shuffle) of value streams.

A general static permutation of ``nnz`` values — the CSR→CSC value
reorder behind column-direction ops, the transpose-SpMM value prep —
costs ~22 ms at 3M entries as an XLA flat gather on the v5e (per-scalar
HBM transactions).  This module routes the same permutation as three
axis-local stages over an ``(R, 128)`` layout:

    stage 1: permute within each row     (lane gather)
    stage 2: permute within each column  (sublane routing)
    stage 3: permute within each row     (lane gather)

Classic 3-stage Clos/mesh routing: model each element as an edge from
its source row to its destination row in a bipartite multigraph (128
edges per node).  By Kőnig's theorem the graph has a proper
128-edge-coloring (computed host-side by recursive Euler splitting,
:func:`..native.color_bipartite`); the color is the element's
intermediate lane, which makes every stage collision-free.  Each stage's
gather indices vary along one axis only, so the whole permutation runs
at a few streaming passes instead of per-element transactions.

The reference has no analogue (torch's ``index_select`` handles arbitrary
gathers natively on GPU, e.g. sparse_matmul.py:201-205); this exists
because the TPU's vector ISA has no scattered HBM access.

Plans are built from static patterns host-side and cached; application
is differentiable (the VJP applies the inverse plan, built by inverting
each stage's index arrays — no second coloring pass).

**Measured outcome on a real v5e (benchmarks/probe_shuffle_pallas.py)**:
Mosaic's ``dynamic_gather`` is strictly vreg-local — a lane gather may
only source lanes of the *same* 8x128 vector register ("Multiple source
vregs along gather dimension" otherwise).  Stages 1/3 (lane gathers on
(8,128) tiles) compile and run at ~1.5 ms each at 3M entries, but the
middle stage routes values *between* rows, which no Mosaic primitive
covers: the transpose-sandwiched wide lane gather does not compile, and
XLA's ``take_along_axis`` lowers to a generic gather (3-stage XLA total
71 ms — worse than one flat 22 ms ``jnp.take``).  The 3-stage plan is
therefore used off-TPU only (where it is exact and tested); on TPU every
caller uses the flat take, whose ~22 ms at 3M entries is the platform's
per-scalar relayout floor.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import as_device_array

LANE = 128


@dataclass(frozen=True, eq=False)  # id-hash: ndarray fields, vjp nondiff arg
class ShufflePlan:
    """Index arrays for one 3-stage application; ``inverse`` is built
    lazily by :func:`invert_plan`."""
    n: int                 # logical length (un-padded)
    R: int                 # rows of the (R, 128) routing layout
    idx1: np.ndarray       # (R, 128) int32 lane gather
    idx2: np.ndarray       # (R, 128) int32 per-column source row
    idx3: np.ndarray       # (R, 128) int32 lane gather


def build_shuffle_plan(perm: np.ndarray, n: int) -> Optional[ShufflePlan]:
    """Plan for ``out[i] = v[perm[i]]``; ``perm`` must be a permutation of
    ``[0, n)``.  Returns None when the edge-coloring is unavailable
    (no native library at large nnz) — callers fall back to ``jnp.take``.
    """
    from .. import native

    perm = np.ascontiguousarray(perm, np.int64)
    if perm.shape != (n,):
        raise ValueError("build_shuffle_plan: perm must be (n,)")
    R = -(-n // LANE)
    npad = R * LANE
    # complete to a bijection on the padded slots: tail dest slots read the
    # tail source slots (identity on the padding)
    perm_pad = np.concatenate(
        [perm, np.arange(n, npad, dtype=np.int64)])
    src = perm_pad // LANE                 # source row per dest slot
    dst = np.arange(npad, dtype=np.int64) // LANE
    colors = native.color_bipartite(src, dst, R, LANE)
    if colors is None:
        return None
    colors = colors.astype(np.int64)
    # after stage 1 the element sits at (src_row, color): within each
    # source row all colors are distinct (proper coloring)
    idx1 = np.empty((R, LANE), np.int32)
    idx1[src, colors] = (perm_pad % LANE).astype(np.int32)
    # stage 2 moves it to (dst_row, color) within its lane
    idx2 = np.empty((R, LANE), np.int32)
    idx2[dst, colors] = src.astype(np.int32)
    # stage 3 moves it to its final lane within the dest row
    idx3 = np.empty((R, LANE), np.int32)
    idx3[dst, np.arange(npad) % LANE] = colors.astype(np.int32)
    return ShufflePlan(n=n, R=R, idx1=idx1, idx2=idx2, idx3=idx3)


@lru_cache(maxsize=256)
def _inverse_plan(plan: ShufflePlan) -> ShufflePlan:
    """Invert each stage: the inverse permutation is
    stage1⁻¹ ∘ stage2⁻¹ ∘ stage3⁻¹ — again three axis-local stages."""
    inv1 = np.argsort(plan.idx1, axis=1).astype(np.int32)
    inv2 = np.argsort(plan.idx2, axis=0).astype(np.int32)
    inv3 = np.argsort(plan.idx3, axis=1).astype(np.int32)
    # forward: y = S3(S2(S1 x)) with S1,S3 lane stages and S2 the sublane
    # stage; inverse: x = S1⁻¹(S2⁻¹(S3⁻¹ y)) = a plan whose stage order is
    # (lane inv3, sublane inv2, lane inv1)
    return ShufflePlan(n=plan.n, R=plan.R, idx1=inv3, idx2=inv2, idx3=inv1)


_TILE = 512


def _apply_stages(plan: ShufflePlan, x: jax.Array) -> jax.Array:
    npad = plan.R * LANE
    flat = x.ravel()
    if npad != plan.n:
        flat = jnp.pad(flat, (0, npad - plan.n))
    y = flat.reshape(plan.R, LANE)
    y = jnp.take_along_axis(y, as_device_array(plan.idx1), axis=1)
    y = jnp.take_along_axis(y, as_device_array(plan.idx2), axis=0)
    y = jnp.take_along_axis(y, as_device_array(plan.idx3), axis=1)
    return y.reshape(-1)[:plan.n]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _shuffle(plan: ShufflePlan, x):
    return _apply_stages(plan, x)


def _shuffle_fwd(plan, x):
    return _shuffle(plan, x), None


def _shuffle_bwd(plan, _, ct):
    return (_apply_stages(_inverse_plan(plan), ct),)


_shuffle.defvjp(_shuffle_fwd, _shuffle_bwd)


def shuffle_values(plan: ShufflePlan, x: jax.Array) -> jax.Array:
    """Apply ``out[i] = x[perm[i]]`` via the 3-stage plan (differentiable:
    the VJP applies the inverse plan)."""
    if x.shape != (plan.n,):
        raise ValueError(
            f"shuffle_values: expected shape ({plan.n},), got {x.shape}")
    return _shuffle(plan, x)


# --------------------------------------------------------------------------
# expansion-gather permutation (round 5): the on-TPU fast path
# --------------------------------------------------------------------------
#
# The flat ``jnp.take(x, perm)`` pays a per-SCALAR gather op per entry
# (~19-22 ms at 3M values on v5e).  The expansion route below re-issues
# the same permutation as 128-lane ROW gathers (broadcast x to (n, 128),
# gather rows, slice lane 0) on the theory that scalar gather was
# op-issue-bound rather than transaction-bound.  **Measured (round 5,
# benchmarks/probe_r5.py)**: expansion-gather 21.0-21.8 ms vs flat take
# 20.7 ms at 3M f32 values — the flat gather is already HBM-transaction
# -bound, so routing scalars as rows buys nothing and costs 128x the
# bytes.  The expand route is therefore OFF by default
# (``TSGU_PERMUTE_EXPAND=1`` re-enables it for re-probing); what this
# module's TPU path really contributes is the custom VJP: the inverse
# permutation by the same gather (~21 ms) instead of autodiff's default
# unsorted scatter-add (~25 ms, and unfusable).

EXPAND_MIN_N = 1 << 19        # below this the flat take is cheap enough


def _expand_take(perm_dev: jax.Array, x: jax.Array) -> jax.Array:
    E = jnp.broadcast_to(x[:, None], (x.shape[0], LANE))
    E = jax.lax.optimization_barrier(E)
    G = jnp.take(E, perm_dev, axis=0)
    G = jax.lax.optimization_barrier(G)
    return G[:, 0]


def _use_expand(n: int, dtype) -> bool:
    import os

    from . import dispatch
    return (os.environ.get("TSGU_PERMUTE_EXPAND", "0") == "1"
            and dispatch.on_tpu() and n >= EXPAND_MIN_N
            and dtype in (jnp.float32, jnp.bfloat16))


# Crossover: the flat take costs ~6.7 µs per 1k values (measured 20.6 ms
# at 3.1M); the network costs ~2·log2(N) streamed passes ≈ 0.5 µs/1k at
# 1M.  Well above break-even by 128k; below that the flat take's <1 ms
# doesn't repay a plan's mask memory.  (Round-5 hybrid_bwd probe caught
# the old 1<<20 gate excluding the 926k-entry hybrid residual reorder.)
BENES_MIN_N = 1 << 17


def _use_benes(n: int, dtype) -> bool:
    """Route large TPU permutations through the Beneš exchange network
    (kernels/benes.py): ~2·log2(N) streaming stages instead of one HBM
    transaction per element.  ``TSGU_PERMUTE_BENES=0`` restores the flat
    gather for A/B runs."""
    import os

    from . import dispatch
    return (os.environ.get("TSGU_PERMUTE_BENES", "1") == "1"
            and dispatch.on_tpu() and n >= BENES_MIN_N
            and dtype in (jnp.float32, jnp.bfloat16))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _permute(perm_sa, inv_sa, x):
    if _use_benes(x.shape[0], x.dtype):
        from . import benes
        if benes.has_plan(perm_sa):
            return benes.benes_permute(perm_sa, x)
    perm_dev = as_device_array(perm_sa.arr)
    if _use_expand(x.shape[0], x.dtype):
        return _expand_take(perm_dev, x)
    return jnp.take(x, perm_dev)


def _permute_fwd(perm_sa, inv_sa, x):
    return _permute(perm_sa, inv_sa, x), None


def _permute_bwd(perm_sa, inv_sa, _, ct):
    # out[i] = x[perm[i]]  =>  d_x[j] = ct[inv[j]] — another permutation
    # (the autodiff default would be an unsorted scatter, ~25 ms at 3M)
    return (_permute(inv_sa, perm_sa, ct),)


_permute.defvjp(_permute_fwd, _permute_bwd)


@lru_cache(maxsize=256)
def _perm_pair(perm_sa):
    inv = np.argsort(perm_sa.arr).astype(perm_sa.arr.dtype)
    from ..types import StaticArray
    return StaticArray(np.ascontiguousarray(inv))


def permute_values(perm_sa, x: jax.Array) -> jax.Array:
    """Differentiable static permutation ``out[i] = x[perm[i]]``.

    ``perm_sa``: a :class:`~..types.StaticArray` holding a permutation of
    ``[0, len(x))``.  Runs as one flat gather (the platform's per-entry
    relayout floor; the expansion route measured no faster — see module
    docstring); the value is the VJP, which applies the inverse
    permutation by the same gather instead of autodiff's scatter-add.
    """
    return _permute(perm_sa, _perm_pair(perm_sa), x)
