"""Preconditioned conjugate gradients as a ``lax.while_loop`` driver.

Rebuild of the reference's ``linear_cg``
(``/root/reference/torchsparsegradutils/utils/linear_cg.py:100-432``):
batched multi-RHS, optional preconditioner, rhs normalisation (:259-265),
"min 10 iterations" + mean-residual convergence semantics (:378-384),
per-column freezing of converged columns, and optional Lanczos
tridiagonalisation of the first ``n_tridiag`` RHS columns (:304-430) for
stochastic logdet estimation.

TPU-native differences: the Python loop with host-synced residual tests
becomes a ``while_loop`` whose predicate reads a converged mask computed on
device; the ``@torch.jit.script`` micro-kernels (:27-97) are unnecessary —
XLA fuses the axpy/dot updates.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .common import (
    SolveInfo,
    as_matvec,
    col_norms,
    ensure_matrix,
    maybe_warn_not_converged,
    safe_div,
)

__all__ = ["linear_cg", "LinearCGSettings"]


@dataclasses.dataclass(frozen=True)
class LinearCGSettings:
    max_iter: int = 1000
    rtol: float = 1e-5
    atol: float = 0.0
    min_iter: int = 10
    # when True, convergence uses the mean residual across columns
    # (reference linear_cg.py:378-384); False = per-column max.
    mean_residual: bool = True
    # per-iteration residual printing (reference linear_cg.py:275-277);
    # emitted with jax.debug.print, so it also fires under jit.
    verbose: bool = False


def linear_cg(A, rhs, *, settings: LinearCGSettings = LinearCGSettings(),
              preconditioner: Optional[Callable] = None, x0=None,
              n_tridiag: int = 0, diagnostics: bool = False):
    """Solve ``A x = rhs`` for SPD ``A`` (matrix-like or matvec closure).

    Args:
      A: sparse container, dense matrix, or callable ``x -> A @ x`` acting on
        ``(n,)`` / ``(n, k)``.
      rhs: ``(n,)`` or ``(n, k)`` right-hand side(s).
      preconditioner: optional callable ``r -> M⁻¹ r``.
      n_tridiag: tridiagonalise w.r.t. the first ``n_tridiag`` columns,
        returning ``(x, (t_diag, t_off, iters))`` with ``t_diag`` of shape
        ``(max_iter, n_tridiag)`` and ``t_off`` of shape
        ``(max_iter-1, n_tridiag)`` (entries beyond ``iters`` are padding).
      diagnostics: when True, additionally return a
        :class:`~.common.SolveInfo` (iterations, final residual norms,
        per-column converged mask) as the last element.

    Returns:
      ``x`` with the shape of ``rhs`` (plus the tridiag tuple if
      requested, plus the ``SolveInfo`` if ``diagnostics=True``).
      In eager (non-jit) use a non-convergence ``UserWarning`` fires,
      matching the reference (linear_cg.py:413-423).
    """
    mv = as_matvec(A)
    b, was_vec = ensure_matrix(rhs)
    n, k = b.shape
    dtype = b.dtype
    if n_tridiag > k:
        raise ValueError(f"n_tridiag={n_tridiag} exceeds number of rhs "
                         f"columns {k}")

    precond = preconditioner if preconditioner is not None else (lambda r: r)

    # normalise rhs columns (reference linear_cg.py:259-265)
    b_norm = col_norms(b)
    b_is_zero = b_norm < jnp.finfo(dtype).tiny
    scale = jnp.where(b_is_zero, 1.0, b_norm)
    b_hat = b / scale

    x = jnp.zeros_like(b) if x0 is None else (
        ensure_matrix(x0)[0] / scale)
    r = b_hat - (mv(x) if x0 is not None else jnp.zeros_like(b))
    z = precond(r)
    p = z
    rz = jnp.sum(r * z, axis=0)

    tol = jnp.maximum(settings.rtol * col_norms(b_hat),
                      settings.atol / scale).astype(dtype)

    mi = settings.max_iter
    t_diag0 = jnp.zeros((max(mi, 1), max(n_tridiag, 1)), dtype)
    t_off0 = jnp.zeros((max(mi - 1, 1), max(n_tridiag, 1)), dtype)
    alpha_prev = jnp.ones((k,), dtype)
    beta_prev = jnp.zeros((k,), dtype)

    def converged_mask(r):
        res = col_norms(r)
        if settings.mean_residual:
            return jnp.broadcast_to(res.mean() < tol.mean(), (k,))
        return res < tol

    def cond(state):
        (x, r, z, p, rz, i, t_diag, t_off, a_prev, b_prev) = state
        done = jnp.all(converged_mask(r) | b_is_zero)
        return (~((i >= settings.min_iter) & done)) & (i < mi)

    def body(state):
        (x, r, z, p, rz, i, t_diag, t_off, a_prev, b_prev) = state
        Ap = mv(p)
        pAp = jnp.sum(p * Ap, axis=0)
        alpha = safe_div(rz, pAp)
        frozen = converged_mask(r) | b_is_zero
        alpha = jnp.where(frozen, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(frozen, 0.0, safe_div(rz_new, rz))
        p = z + beta * p
        if settings.verbose:
            jax.debug.print(
                "linear_cg iter {i}: mean residual {res:.3e}",
                i=i + 1, res=col_norms(r).mean())
        if n_tridiag:
            # T[i,i] = 1/alpha_i + beta_{i-1}/alpha_{i-1};
            # T[i,i+1] = sqrt(beta_i)/alpha_i  (Lanczos-from-CG recurrence)
            a_t = alpha[:n_tridiag]
            diag_entry = safe_div(jnp.ones_like(a_t), a_t) + jnp.where(
                i == 0, 0.0,
                safe_div(b_prev[:n_tridiag], a_prev[:n_tridiag]))
            t_diag = t_diag.at[i, :n_tridiag].set(diag_entry)
            off_entry = safe_div(jnp.sqrt(jnp.maximum(beta[:n_tridiag], 0.0)),
                                 a_t)
            t_off = jax.lax.cond(
                i < mi - 1,
                lambda t: t.at[i, :n_tridiag].set(off_entry),
                lambda t: t, t_off)
        return (x, r, z, p, rz_new, i + 1, t_diag, t_off, alpha, beta)

    state = (x, r, z, p, rz, jnp.array(0, jnp.int32), t_diag0, t_off0,
             alpha_prev, beta_prev)
    (x, r, z, p, rz, iters, t_diag, t_off, _, _) = jax.lax.while_loop(
        cond, body, state)

    x = x * scale
    x = jnp.where(b_is_zero, 0.0, x)
    x_out = x[:, 0] if was_vec else x
    res = col_norms(r) * scale          # de-normalised absolute residual
    conv = converged_mask(r) | b_is_zero
    info = SolveInfo(iterations=iters,
                     residual=res[0] if was_vec else res,
                     converged=conv[0] if was_vec else conv)
    maybe_warn_not_converged(info, "linear_cg")
    out = (x_out,)
    if n_tridiag:
        out += ((t_diag[:, :n_tridiag], t_off[:, :n_tridiag], iters),)
    if diagnostics:
        out += (info,)
    return out[0] if len(out) == 1 else out
