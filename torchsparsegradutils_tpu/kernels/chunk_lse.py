"""Pallas chunked one-pass logsumexp over sparse rows.

The segment-scatter formulation of ``sparse_logsumexp`` costs ~78 ms at
cfd2 scale on a v5e (three scalar segment ops over 3M entries).  This
kernel streams the entries once in their natural row-sorted chunks
(reusing the SpMM ``ChunkPlan``) and emits **online-logsumexp partials**
per chunk-local row rank:

    pm[rank] = max of the rank's entries in the chunk
    ps[rank] = Σ exp(v − pm[rank])

which combine associatively across chunks with one segment-max and one
segment-sum over only ``nchunks·W`` values (~60× fewer than nnz).
Structural-zero mass (``include_zeros``) and the ±inf edge semantics are
applied in the combine; the backward is a second chunk pass computing
``exp(v − out[row]) · g[row]`` per entry via a one-hot matvec (out in
natural entry order — no scatter anywhere).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import StaticArray, as_device_array
from .chunk_spmm import ChunkPlan, build_chunk_plan, interpret_mode

NEG_INF = float("-inf")


def _pad_entries_neginf(x, plan: ChunkPlan):
    pad = plan.nnz_pad - plan.nnz
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), NEG_INF, x.dtype)])
    return x


def _lse_partials(plan: ChunkPlan, data):
    """One kernel pass -> (pm, ps) of shape (nchunks, W).

    Tiles run f32 regardless of storage dtype: bf16 (SB, C)/(SB, W)
    blocks violate Mosaic's 16-sublane tile, and the online-LSE partials
    benefit from f32 anyway (see chunk_spmm's identical policy)."""
    SB, C, W = plan.SB, plan.C, plan.W
    vals = _pad_entries_neginf(data, plan).reshape(
        plan.nchunks, C).astype(jnp.float32)

    def kernel(lr_ref, vals_ref, pm_ref, ps_ref):
        for i in range(SB):
            l = lr_ref[i]
            v = vals_ref[i]
            X = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (W, C), 0) == l[None, :],
                v[None, :], NEG_INF)
            pm = jnp.max(X, axis=1)
            pm_safe = jnp.where(jnp.isfinite(pm), pm, 0.0)
            E = jnp.where(X == NEG_INF, 0.0, jnp.exp(X - pm_safe[:, None]))
            pm_ref[i] = pm
            ps_ref[i] = E.sum(axis=1)

    spec_in = pl.BlockSpec((SB, C), lambda s: (s, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((SB, W), lambda s: (s, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(plan.nchunks // SB,), in_specs=[spec_in, spec_in],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((plan.nchunks, W), jnp.float32),
                   jax.ShapeDtypeStruct((plan.nchunks, W), jnp.float32)),
        interpret=interpret_mode(),
    )(as_device_array(plan.lr), vals)


def _lse_combine(plan: ChunkPlan, pm, ps, counts: np.ndarray, width: int,
                 include_zeros: bool):
    n = plan.n
    seg = as_device_array(plan.seg_rows).reshape(-1)
    pmf = pm.reshape(-1)
    psf = ps.reshape(-1)
    M = jax.ops.segment_max(pmf, seg, num_segments=n + 1)[:n]
    M_safe = jnp.where(jnp.isfinite(M), M, 0.0)
    shift_diff = jnp.where(jnp.isfinite(pmf), pmf, 0.0) - jnp.take(
        jnp.concatenate([M_safe, jnp.zeros(1, M.dtype)]), seg)
    w = jnp.where(psf > 0, psf * jnp.exp(shift_diff), 0.0)
    S = jax.ops.segment_sum(w, seg, num_segments=n + 1)[:n]
    if include_zeros:
        # as_device_array, NOT jnp.asarray: raw-numpy captures inline as
        # host constants the JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS hoister
        # rejects (TypedNdArray sharding error, jax 0.9.0)
        zc = as_device_array((width - counts).astype(np.float32)).astype(
            M.dtype)
        has_zeros = zc > 0
        Mz = jnp.where(has_zeros, jnp.maximum(M_safe, 0.0), M_safe)
        S = S * jnp.exp(M_safe - Mz) + jnp.where(has_zeros,
                                                 zc * jnp.exp(-Mz), 0.0)
        M_out = Mz
    else:
        M_out = M_safe
    empty = S == 0.0
    out = jnp.where(empty, NEG_INF,
                    M_out + jnp.log(jnp.where(empty, 1.0, S)))
    # +inf entries: max is +inf -> result +inf (partials degenerate to NaN)
    out = jnp.where(M == jnp.inf, jnp.inf, out)
    return out


def _lse_bwd_pass(plan: ChunkPlan, data, out, g):
    """d_data[e] = exp(v_e - out[row_e]) * g[row_e], natural order."""
    SB, C, W = plan.SB, plan.C, plan.W
    vals = _pad_entries_neginf(data, plan).reshape(
        plan.nchunks, C).astype(jnp.float32)
    out = out.astype(jnp.float32)
    g = g.astype(jnp.float32)
    pad1 = jnp.concatenate([out, jnp.zeros(1, out.dtype)])
    padg = jnp.concatenate([g, jnp.zeros(1, g.dtype)])
    seg = as_device_array(np.minimum(plan.seg_rows, plan.n)).reshape(-1)
    OutR = jnp.take(pad1, seg).reshape(plan.nchunks, W)
    GR = jnp.take(padg, seg).reshape(plan.nchunks, W)

    def kernel(lr_ref, vals_ref, outr_ref, gr_ref, dv_ref):
        for i in range(SB):
            l = lr_ref[i]
            v = vals_ref[i]
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (C, W), 1) == l[:, None]).astype(v.dtype)
            oute = onehot @ outr_ref[i]           # (C,)
            ge = onehot @ gr_ref[i]
            safe = jnp.isfinite(oute) & (v != NEG_INF)
            dv = jnp.where(safe, jnp.exp(v - jnp.where(safe, oute, 0.0))
                           * ge, 0.0)
            dv_ref[i] = dv

    spec_c = pl.BlockSpec((SB, C), lambda s: (s, 0),
                          memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((SB, W), lambda s: (s, 0),
                          memory_space=pltpu.VMEM)
    dv = pl.pallas_call(
        kernel, grid=(plan.nchunks // SB,),
        in_specs=[spec_c, spec_c, spec_w, spec_w], out_specs=spec_c,
        out_shape=jax.ShapeDtypeStruct((plan.nchunks, C), jnp.float32),
        interpret=interpret_mode(),
    )(as_device_array(plan.lr), vals, OutR, GR)
    return dv.reshape(-1)[:plan.nnz].astype(data.dtype)


@lru_cache(maxsize=256)
def lse_fn_transposed(rows_sa: StaticArray, cols_sa: StaticArray, n: int,
                      m: int, include_zeros: bool):
    """Column-wise LSE = row-wise LSE of the transpose: returns
    ``(fn, reorder)`` where ``fn(reorder(data))`` gives the (m,) result,
    or None.  ``reorder`` moves values to CSC order through
    :func:`..kernels.shuffle.permute_values` — on TPU the Beneš
    exchange network (kernels/benes.py: streamed stages instead of
    ~21 ms of per-scalar gather ops at 3M values), with the inverse
    permutation as its VJP (the autodiff default would be an unsorted
    scatter)."""
    from .. import native
    from .grid_lse import grid_lse_fn
    from .shuffle import permute_values
    rows = rows_sa.arr.astype(np.int64)
    cols = cols_sa.arr.astype(np.int64)
    if rows.ndim != 1 or len(rows) == 0:
        return None
    perm = native.lexsort_rowcol(cols, rows, n)
    rt = StaticArray(np.ascontiguousarray(cols[perm]))
    ct = StaticArray(np.ascontiguousarray(rows[perm]))
    fn = grid_lse_fn(rt, ct, m, n, include_zeros)
    if fn is None:
        fn = lse_fn(rt, ct, m, n, include_zeros)
    if fn is None:
        return None
    perm_sa = StaticArray(np.ascontiguousarray(perm.astype(np.int64)))

    def reorder(data, _p=perm_sa):
        return permute_values(_p, data)

    return fn, reorder


@lru_cache(maxsize=256)
def lse_fn(rows_sa: StaticArray, cols_sa: StaticArray, n: int, m: int,
            include_zeros: bool):
    """Cached custom-vjp row-logsumexp for one pattern.  Returns None if no
    chunk plan applies (unsorted/empty patterns)."""
    plan = build_chunk_plan(rows_sa, cols_sa, n, m)
    if plan is None:
        return None
    counts = np.bincount(rows_sa.arr.astype(np.int64), minlength=n)

    @jax.custom_vjp
    def f(data):
        pm, ps = _lse_partials(plan, data)
        out = _lse_combine(plan, pm, ps, counts, m, include_zeros)
        return out.astype(data.dtype)

    def fwd(data):
        pm, ps = _lse_partials(plan, data)
        # keep the f32 combine result for the backward's exp(v - out)
        out = _lse_combine(plan, pm, ps, counts, m, include_zeros)
        return out.astype(data.dtype), (data, out)

    def bwd(res, g):
        data, out = res
        return (_lse_bwd_pass(plan, data, out, g),)

    f.defvjp(fwd, bwd)
    return f
