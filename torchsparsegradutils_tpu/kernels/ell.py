"""Scatter-aware ELL execution plans for SpMM / SDDMM on TPU.

Measured on a v5e chip (bench.py; numbers for cfd2-scale, nnz=3.1M,
p=128, f32):

  * random row gathers of B (512 B rows)   ~66 GB/s  → 21-23 ms / pass
  * gather + segment-sum SpMM (naive)                 ~60 ms
  * nnz→ELL value conversion: scalar gather 53 ms, **scatter 25 ms**,
    vmapped dynamic-slice 145 ms (XLA lowers it badly)
  * ELL gather-einsum with values already padded      ~21 ms

So the scatter-free ELL forward (`out[i] = Σ_k ev[i,k]·B[ec[i,k]]`) wins
when the one-time scatter conversion (25 ms) + gather-einsum (21 ms)
beats the naive path — which it does (~46 vs ~60 ms).  The backward
passes keep the gather-dot / segment-sum fallbacks (measured faster than
their ELL variants once conversion costs are counted; see ops/spmm.py).

Plans are host-side numpy, cached on the content hash of the index arrays
(``StaticArray``), padded per row to the max row degree K, with a guard
against degree-skew blowup (``n·K > ELL_MAX_EXPAND · nnz``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import StaticArray, as_device_array

ELL_MAX_EXPAND = 8.0       # max allowed n*K / nnz padding ratio
ELL_CHUNK_ELEMS = 512 * 1024 * 1024  # cap gathered intermediate elements


@dataclass(frozen=True)
class ELLPlan:
    n: int                  # number of (logical) rows
    m: int                  # number of columns (gather source rows)
    K: int                  # max row degree (padded width)
    cols: np.ndarray        # (n, K) int32 -> gather row in B (0 where pad)
    flat_pos: np.ndarray    # (nnz,) int32 -> position of entry e in (n*K,)
    sorted_pos: bool        # flat_pos strictly increasing (row-major entry
    #                         order) -> scatter/gather hints


@lru_cache(maxsize=256)
def build_ell_plan(rows_sa: StaticArray, cols_sa: StaticArray, n: int,
                   m: int) -> Optional[ELLPlan]:
    rows = rows_sa.arr.astype(np.int64)
    cols = cols_sa.arr.astype(np.int64)
    nnz = len(rows)
    if nnz == 0:
        return None
    cnt = np.bincount(rows, minlength=n)
    K = max(int(cnt.max()), 1)
    if n * K > ELL_MAX_EXPAND * max(nnz, 1):
        return None
    order = np.argsort(rows, kind="stable")
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(cnt, out=starts[1:])
    slot = np.empty(nnz, np.int64)
    slot[order] = np.arange(nnz) - starts[rows[order]]
    ecols = np.zeros((n, K), np.int32)
    ecols[rows, slot] = cols
    flat_pos = (rows * K + slot).astype(np.int32)
    sorted_pos = bool(np.all(np.diff(flat_pos) > 0)) if nnz > 1 else True
    return ELLPlan(n=n, m=m, K=K, cols=ecols, flat_pos=flat_pos,
                   sorted_pos=sorted_pos)


def _ell_values(plan: ELLPlan, data) -> jax.Array:
    """data (nnz,) -> ELL layout (n, K) via scatter (pads stay zero)."""
    flat = jnp.zeros((plan.n * plan.K,), data.dtype)
    flat = flat.at[as_device_array(plan.flat_pos)].set(
        data, unique_indices=True, indices_are_sorted=plan.sorted_pos)
    return flat.reshape(plan.n, plan.K)


def _k_chunks(plan: ELLPlan, p: int):
    """Split the K axis so the gathered (n, Kc, p) intermediate stays small."""
    per_slot = plan.n * p
    kc = max(1, min(plan.K, int(ELL_CHUNK_ELEMS // max(per_slot, 1))))
    return [(s, min(s + kc, plan.K)) for s in range(0, plan.K, kc)]


def ell_spmm(plan: ELLPlan, data, B) -> jax.Array:
    """out (n, p) = A @ B via the row-ELL plan (scatter-free compute; one
    conversion scatter on the nnz values)."""
    p = B.shape[1]
    ev = _ell_values(plan, data)
    ec = as_device_array(plan.cols)
    out = None
    for (s, e) in _k_chunks(plan, p):
        g = jnp.take(B, ec[:, s:e].reshape(-1), axis=0).reshape(
            plan.n, e - s, p)
        c = jnp.einsum("nk,nkp->np", ev[:, s:e], g)
        out = c if out is None else out + c
    return out


def ell_sddmm(plan: ELLPlan, X, Y) -> jax.Array:
    """values (nnz,) of (X @ Yᵀ) at the pattern, in the caller's nonzero
    order.  X is streamed row-aligned; only Y is gathered."""
    p = X.shape[1]
    ec = as_device_array(plan.cols)
    pieces = []
    for (s, e) in _k_chunks(plan, p):
        g = jnp.take(Y, ec[:, s:e].reshape(-1), axis=0).reshape(
            plan.n, e - s, p)
        pieces.append(jnp.einsum("np,nkp->nk", X, g))
    ell_vals = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 1)
    return jnp.take(ell_vals.reshape(-1), as_device_array(plan.flat_pos))
