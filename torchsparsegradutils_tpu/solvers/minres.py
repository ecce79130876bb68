"""MINRES as a ``lax.while_loop`` driver, with joint multi-shift solves.

Rebuild of the reference's ``minres``
(``/root/reference/torchsparsegradutils/utils/minres.py:28-325``):
symmetric (possibly indefinite) systems, batched multi-RHS, and multiple
shifted systems ``(A + σI) x = b`` solved jointly off one shared Lanczos
recurrence (:155-156, 183-184, 321-323 — same ``A + σI`` sign convention
as the reference).  The Lanczos vectors of ``A`` are shift-independent
(Lanczos of ``A + σI`` shares V with tridiagonal ``T + σI``), so only the
Givens-QR state is per (shift, column); one SpMV per iteration serves
every shift and RHS column.

The recurrence follows the standard Paige–Saunders formulation
(cs/sn/dbar/epsln/phibar), vectorised over a ``(shifts, columns)`` grid.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .common import (
    SolveInfo,
    as_matvec,
    col_norms,
    ensure_matrix,
    maybe_warn_not_converged,
)

__all__ = ["minres", "MINRESSettings"]


@dataclasses.dataclass(frozen=True)
class MINRESSettings:
    max_iter: int = 1000
    rtol: float = 1e-5
    atol: float = 0.0
    min_iter: int = 1
    # per-iteration residual printing (reference minres.py:233-238);
    # emitted with jax.debug.print, so it also fires under jit.
    verbose: bool = False


def minres(A, rhs, *, shifts=None,
           settings: MINRESSettings = MINRESSettings(),
           diagnostics: bool = False):
    """Solve ``A x = rhs`` (symmetric A), optionally for several shifts.

    Args:
      A: sparse container / dense matrix / matvec closure (symmetric).
      rhs: ``(n,)`` or ``(n, k)``.
      shifts: optional ``(s,)`` σ values; solves ``(A + σI) x = b`` jointly
        (the reference's sign convention, minres.py:43), returning a
        leading shift axis.
      diagnostics: when True, also return a ``SolveInfo`` whose
        residual/converged carry the same (shift, column) axes as ``x``.

    Returns:
      ``x`` shaped like ``rhs`` (with a leading ``(s,)`` axis if shifts
      were given); ``(x, SolveInfo)`` with ``diagnostics=True``.  In
      eager use a non-convergence ``UserWarning`` fires.
    """
    mv = as_matvec(A)
    b, was_vec = ensure_matrix(rhs)
    n, k = b.shape
    dtype = b.dtype
    eps = jnp.finfo(dtype).eps

    if shifts is None:
        sig = jnp.zeros((1,), dtype)
        squeeze_shift = True
    else:
        sig = jnp.asarray(shifts, dtype).reshape(-1)
        squeeze_shift = False
    s = sig.shape[0]

    b_norm = col_norms(b)
    b_is_zero = b_norm < jnp.finfo(dtype).tiny
    scale = jnp.where(b_is_zero, 1.0, b_norm)
    b_hat = b / scale  # unit columns
    tol = jnp.maximum(settings.rtol, settings.atol / jnp.maximum(
        b_norm, jnp.finfo(dtype).tiny)).astype(dtype)

    # shared Lanczos state
    beta0 = col_norms(b_hat)
    v = b_hat / jnp.where(beta0 > 0, beta0, 1.0)
    v_prev = jnp.zeros_like(b)

    # per-(shift, column) QR state
    zsk = jnp.zeros((s, k), dtype)
    x = jnp.zeros((s, n, k), dtype)
    w_prev = jnp.zeros((s, n, k), dtype)
    w_pprev = jnp.zeros((s, n, k), dtype)
    cs = -jnp.ones((s, k), dtype)
    sn = zsk
    dbar = zsk
    epsln = zsk
    phibar = jnp.broadcast_to(beta0, (s, k))

    def frozen_mask(phibar):
        return (jnp.abs(phibar) < tol[None, :]) | b_is_zero[None, :]

    def cond(state):
        (x, v_prev, v, beta, phibar, cs, sn, dbar, epsln, w_prev, w_pprev,
         i) = state
        return (~(jnp.all(frozen_mask(phibar)) & (i >= settings.min_iter))) \
            & (i < settings.max_iter)

    def body(state):
        (x, v_prev, v, beta, phibar, cs, sn, dbar, epsln, w_prev, w_pprev,
         i) = state
        frozen = frozen_mask(phibar)
        # --- shared Lanczos step on unshifted A
        Av = mv(v)
        alfa = jnp.sum(v * Av, axis=0)                      # (k,)
        r = Av - alfa * v - beta * v_prev
        beta_new = col_norms(r)
        v_new = r / jnp.where(beta_new > eps, beta_new, 1.0)

        # --- per-shift Paige–Saunders rotations
        alfa_s = alfa[None, :] + sig[:, None]               # (s, k)
        beta_nb = jnp.broadcast_to(beta_new, (s, k))
        oldeps = epsln
        delta = cs * dbar + sn * alfa_s
        gbar = sn * dbar - cs * alfa_s
        epsln_new = sn * beta_nb
        dbar_new = -cs * beta_nb
        gamma = jnp.maximum(jnp.sqrt(gbar ** 2 + beta_nb ** 2), eps)
        cs_new = gbar / gamma
        sn_new = beta_nb / gamma
        phi = cs_new * phibar
        phibar_new = jnp.where(frozen, phibar, sn_new * phibar)

        w_new = (v[None] - oldeps[:, None, :] * w_pprev
                 - delta[:, None, :] * w_prev) / gamma[:, None, :]
        x = jnp.where(frozen[:, None, :], x, x + phi[:, None, :] * w_new)
        if settings.verbose:
            jax.debug.print(
                "minres iter {i}: max |phibar| {res:.3e}",
                i=i + 1, res=jnp.abs(phibar_new).max())
        return (x, v, v_new, beta_new, phibar_new, cs_new, sn_new,
                dbar_new, epsln_new, w_new, w_prev, i + 1)

    state = (x, v_prev, v, jnp.zeros((k,), dtype), phibar, cs, sn, dbar,
             epsln, w_prev, w_pprev, jnp.array(0, jnp.int32))
    fin = jax.lax.while_loop(cond, body, state)
    x, phibar, iters = fin[0], fin[4], fin[-1]
    x = x * scale[None, None, :]
    x = jnp.where(b_is_zero[None, None, :], 0.0, x)
    # |phibar| is the Paige–Saunders residual-norm estimate on the
    # unit-scaled system; de-normalise to rhs units
    res = jnp.abs(phibar) * scale[None, :]
    conv = frozen_mask(phibar)
    if was_vec:
        x, res, conv = x[:, :, 0], res[:, 0], conv[:, 0]
    if squeeze_shift:
        x, res, conv = x[0], res[0], conv[0]
    info = SolveInfo(iterations=iters, residual=res, converged=conv)
    maybe_warn_not_converged(info, "minres")
    return (x, info) if diagnostics else x
