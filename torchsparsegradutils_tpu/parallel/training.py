"""Flagship 2-D-parallel training step: sparse-precision Gaussian fitting.

The library's flagship "model" is the reference's integration path
(SURVEY §3.5): PairwiseEncoder pattern → sparse triangular factor →
SparseMultivariateNormal → log-density / sampling → gradients on the
factor values.  This module trains that model — maximum-likelihood fitting
of a sparse-precision Gaussian to data — over a 2-D device mesh:

  * ``dp`` axis: data parallelism over observations (each device computes
    the quadratic form for its slice of the batch; loss terms are psum'd).
  * ``tp`` axis: tensor parallelism over the event dimension — the
    ``Lᵀ δ`` SpMM is row-sharded via :mod:`.sharding` so each device owns a
    slab of the factor's rows; per-sample squared norms are psum'd over tp.

Pipeline/expert parallelism do not apply to this model family (no layer
stack, no experts) — the meaningful axes for sparse linear algebra are
data and operator-row sharding, which is what the reference's scaling story
(bigger nnz / event dims, SURVEY §5) maps to on a TPU mesh.

Loss (precision-LLᵀ parameterization, exact, no sampling needed):
  −log p(x) = ½‖Lᵀ(x−μ)‖² − Σ log|diag L| + (n/2)·log 2π
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.encoders import PairwiseEncoder

__all__ = ["make_model", "make_train_step", "init_params", "loss_fn"]


def make_model(volume_shape=(1, 8, 8), radius: float = 1.0):
    """Build the flagship pattern: strictly-lower pairwise factor over an
    nD volume (LDLᵀ precision parameterization)."""
    enc = PairwiseEncoder(radius, volume_shape, diag=False, upper=False,
                          layout="coo")
    return enc


def init_params(key, enc: PairwiseEncoder) -> Dict[str, jax.Array]:
    n = enc.volume_numel
    kv, kd = jax.random.split(key)
    return {
        "values": 0.01 * jax.random.normal(
            kv, (len(enc.offsets),) + enc.volume_shape),
        "log_diag": jnp.zeros((n,)),        # D = exp(log_diag) > 0
        "loc": jnp.zeros((n,)),
    }


def loss_fn(params, x, enc: PairwiseEncoder):
    """Single-device negative mean log-likelihood (precision LDLᵀ).

    x: (S, n) observations.  Ω = (I+L) D (I+L)ᵀ with L strictly lower from
    the encoder; −log p = ½ δᵀΩδ − ½Σ log D + const.
    """
    L = enc(params["values"])
    n = enc.volume_numel
    D = jnp.exp(params["log_diag"])
    delta = x - params["loc"]                      # (S, n)
    E = delta.T                                    # (n, S)
    from ..ops.spmm import sparse_mm
    y = E + sparse_mm(L.T, E)                      # (I+L)ᵀ δ
    quad = (D[:, None] * y * y).sum(0)             # (S,)
    logdet = jnp.log(D).sum()
    nll = 0.5 * quad - 0.5 * logdet + 0.5 * n * jnp.log(2 * jnp.pi)
    return nll.mean()


def make_train_step(enc: PairwiseEncoder, mesh: Mesh, lr: float = 1e-2):
    """Build a jitted 2-D-parallel (dp × tp) SGD training step.

    The factor's transpose is row-sharded over ``tp`` (static pattern →
    host-side partition is rebuilt per call from the encoder's fixed
    pattern metadata); observations are sharded over ``dp``.  Returns
    ``step(params, x) -> (params, loss)``.
    """
    n = enc.volume_numel
    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]
    # Static pattern of L^T: encoder pattern with (row, col) swapped.
    rows_t = enc._out_cols.astype(np.int64)
    cols_t = enc._out_rows.astype(np.int64)
    rps = -(-n // tp)
    shard_of = rows_t // rps
    nnz_per = np.bincount(shard_of, minlength=tp)
    nnzs = max(int(nnz_per.max()), 1)
    local_rows = np.zeros((tp, nnzs), np.int32)
    g_cols = np.zeros((tp, nnzs), np.int32)
    sel = np.zeros((tp, nnzs), np.int64)
    mask = np.zeros((tp, nnzs), bool)
    order = np.argsort(shard_of, kind="stable")
    offs = np.zeros(tp + 1, np.int64)
    np.cumsum(nnz_per, out=offs[1:])
    for s in range(tp):
        idx = order[offs[s]:offs[s + 1]]
        local_rows[s, :len(idx)] = rows_t[idx] - s * rps
        g_cols[s, :len(idx)] = cols_t[idx]
        sel[s, :len(idx)] = idx
        mask[s, :len(idx)] = True
    n_pad = rps * tp

    def factor_values(params):
        """Encoder values -> flat (nnz,) values in the encoder's COO
        order (shared with enc.__call__)."""
        return enc(params["values"]).data

    def nll(params, x_local, n_local_samples):
        """Runs INSIDE shard_map: x_local (S_local, n); psums over tp/dp."""
        vals = factor_values(params)               # replicated compute
        shard_id = jax.lax.axis_index("tp")
        lr_ = jnp.asarray(local_rows)[shard_id]
        c_ = jnp.asarray(g_cols)[shard_id]
        m_ = jnp.asarray(mask)[shard_id]
        d_ = jnp.where(m_, vals[jnp.asarray(sel)[shard_id]], 0.0)
        D = jnp.exp(params["log_diag"])
        delta = x_local - params["loc"]            # (S_l, n)
        E = delta.T                                # (n, S_l)
        # local slab of (L^T) @ E via the library op (custom-VJP sparse
        # gradient at the slab's nonzeros) — the multi-chip path consumes
        # the same op stack as single-chip code
        from .sharding import local_shard_spmm
        y_local = local_shard_spmm(lr_, c_, d_, E, rps)
        # add the identity term (I + L)^T: local rows of E
        E_pad = jnp.pad(E, ((0, n_pad - n), (0, 0)))
        E_slab = jax.lax.dynamic_slice_in_dim(E_pad, shard_id * rps, rps)
        y_local = y_local + E_slab
        D_pad = jnp.pad(D, (0, n_pad - n))
        D_slab = jax.lax.dynamic_slice_in_dim(D_pad, shard_id * rps, rps)
        quad_local = (D_slab[:, None] * y_local * y_local).sum(0)  # (S_l,)
        quad = jax.lax.psum(quad_local, "tp")      # full per-sample quad
        logdet = jnp.log(D).sum()
        nll_local = (0.5 * quad - 0.5 * logdet
                     + 0.5 * n * jnp.log(2 * jnp.pi)).sum()
        total = jax.lax.psum(nll_local, "dp")
        return total / n_local_samples / dp

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("dp")), out_specs=(P(), P()),
             check_vma=False)  # library custom-VJP ops inside
    def loss_and_grads(params, x_local):
        l, g = jax.value_and_grad(nll)(params, x_local, x_local.shape[0])
        # params are replicated; grads already identical across dp (psum'd
        # loss) — psum over nothing needed, but mean over tp replicas of
        # the replicated-compute terms keeps them in sync numerically.
        g = jax.tree.map(lambda t: jax.lax.pmean(t, ("dp", "tp")), g)
        l = jax.lax.pmean(l, ("dp", "tp"))
        return l, g

    @jax.jit
    def step(params, x):
        l, g = loss_and_grads(params, x)
        params = jax.tree.map(lambda p, gr: p - lr * gr, params, g)
        return params, l

    return step
