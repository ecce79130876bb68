"""BiCGSTAB as a ``lax.while_loop`` driver.

Rebuild of the reference's ``bicgstab``
(``/root/reference/torchsparsegradutils/utils/bicgstab.py:22-247``):
non-symmetric square systems, optional right preconditioner, multi-RHS.
The reference recurses per column in Python (:113-124); here multi-RHS is a
``vmap`` over the single-vector driver — the matvec then acts on a stacked
``(n, k)`` block, so every iteration is still one fused SpMM.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .common import (
    SolveInfo,
    as_matvec,
    ensure_matrix,
    maybe_warn_not_converged,
    safe_div,
)

__all__ = ["bicgstab", "BICGSTABSettings"]


@dataclasses.dataclass(frozen=True)
class BICGSTABSettings:
    max_iter: int = 1000       # reference: matvec_max / 2 (2 matvecs/iter)
    rtol: float = 1e-5
    atol: float = 0.0
    min_iter: int = 1
    # per-iteration residual printing — the structured counterpart of the
    # reference's logger hook (bicgstab.py:9-19); fires under jit too.
    verbose: bool = False


def bicgstab(A, rhs, *, settings: BICGSTABSettings = BICGSTABSettings(),
             preconditioner: Optional[Callable] = None, x0=None,
             diagnostics: bool = False):
    """Solve ``A x = rhs`` for general square ``A``.

    ``A`` may be a sparse container, dense matrix, or matvec closure over
    ``(n,)``/``(n, k)`` blocks.  Returns ``x`` shaped like ``rhs``; with
    ``diagnostics=True`` returns ``(x, SolveInfo)`` (the structured
    counterpart of the reference's logger hook, bicgstab.py:9-19).  In
    eager use a non-convergence ``UserWarning`` fires.
    """
    mv = as_matvec(A)
    b, was_vec = ensure_matrix(rhs)
    n, k = b.shape
    dtype = b.dtype
    M = preconditioner if preconditioner is not None else (lambda v: v)

    x = jnp.zeros_like(b) if x0 is None else ensure_matrix(x0)[0]
    r = b - (mv(x) if x0 is not None else jnp.zeros_like(b))
    r_hat = r  # shadow residual
    rho = jnp.ones((k,), dtype)
    alpha = jnp.ones((k,), dtype)
    omega = jnp.ones((k,), dtype)
    v = jnp.zeros_like(b)
    p = jnp.zeros_like(b)

    b_norm = jnp.sqrt(jnp.sum(b * b, axis=0))
    tol = jnp.maximum(settings.rtol * b_norm, settings.atol).astype(dtype)
    b_is_zero = b_norm < jnp.finfo(dtype).tiny

    def res_ok(r):
        return (jnp.sqrt(jnp.sum(r * r, axis=0)) < tol) | b_is_zero

    def cond(state):
        x, r, p, v, rho, alpha, omega, i = state
        return (~(jnp.all(res_ok(r)) & (i >= settings.min_iter))) & \
            (i < settings.max_iter)

    def body(state):
        x, r, p, v, rho, alpha, omega, i = state
        frozen = res_ok(r)
        rho_new = jnp.sum(r_hat * r, axis=0)
        beta = safe_div(rho_new, rho) * safe_div(alpha, omega)
        p = r + beta * (p - omega * v)
        p_hat = M(p)
        v = mv(p_hat)
        alpha = safe_div(rho_new, jnp.sum(r_hat * v, axis=0))
        alpha = jnp.where(frozen, 0.0, alpha)
        s = r - alpha * v
        s_hat = M(s)
        t = mv(s_hat)
        omega_new = safe_div(jnp.sum(t * s, axis=0),
                             jnp.sum(t * t, axis=0))
        omega_new = jnp.where(frozen, 0.0, omega_new)
        x = x + alpha * p_hat + omega_new * s_hat
        r = jnp.where(frozen, r, s - omega_new * t)
        if settings.verbose:
            jax.debug.print(
                "bicgstab iter {i}: max residual {res:.3e}",
                i=i + 1, res=jnp.sqrt(jnp.sum(r * r, axis=0)).max())
        return (x, r, p, v, rho_new, alpha,
                jnp.where(frozen, omega, omega_new), i + 1)

    state = (x, r, p, v, rho, alpha, omega, jnp.array(0, jnp.int32))
    out_state = jax.lax.while_loop(cond, body, state)
    x, r, iters = out_state[0], out_state[1], out_state[-1]
    x = jnp.where(b_is_zero, 0.0, x)
    res = jnp.sqrt(jnp.sum(r * r, axis=0))
    conv = res_ok(r)
    info = SolveInfo(iterations=iters,
                     residual=res[0] if was_vec else res,
                     converged=conv[0] if was_vec else conv)
    maybe_warn_not_converged(info, "bicgstab")
    x_out = x[:, 0] if was_vec else x
    return (x_out, info) if diagnostics else x_out
