"""LSMR least-squares solver as a ``lax.while_loop`` driver.

Rebuild of the reference's ``lsmr``
(``/root/reference/torchsparsegradutils/utils/lsmr.py:21-385``), itself an
adaptation of the Fong & Saunders (2011) algorithm: damped least squares
``min ‖Ax − b‖² + damp²‖x‖²`` via Golub–Kahan bidiagonalisation, with the
standard three stopping tests (residual, normal-equations residual,
condition limit).

TPU-native differences: all per-column scalar recurrences are vectorised
over a ``(k,)`` column axis (the reference loops columns in Python,
sparse_lstsq.py:123-153), so one iteration does a single fused
SpMM + SpMMᵀ pair for every RHS column; stopping tests run on device
inside the while predicate (no host syncs).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .common import as_matvec, as_rmatvec, col_norms, ensure_matrix

__all__ = ["lsmr", "LSMRSettings"]


@dataclasses.dataclass(frozen=True)
class LSMRSettings:
    max_iter: int = 1000
    atol: float = 1e-6
    btol: float = 1e-6
    conlim: float = 1e8
    damp: float = 0.0


def _sym_ortho(a, b):
    """Stable Givens rotation (c, s, r) with r = hypot(a, b)."""
    r = jnp.hypot(a, b)
    safe = jnp.where(r > 0, r, 1.0)
    c = jnp.where(r > 0, a / safe, jnp.ones_like(a))
    s = jnp.where(r > 0, b / safe, jnp.zeros_like(b))
    return c, s, r


def lsmr(A, b, *, rmatvec: Optional[Callable] = None,
         settings: LSMRSettings = LSMRSettings(), x0=None):
    """Solve ``min ‖Ax − b‖²`` (+ damping) for tall or square sparse ``A``.

    Args:
      A: sparse container, dense ``(n, m)`` matrix, or matvec closure (then
        ``rmatvec`` — the ``Aᵀ`` closure — is required).
      b: ``(n,)`` or ``(n, k)``.
      x0: optional initial guess.

    Returns:
      ``(x, itn)`` — solution shaped ``(m,)`` / ``(m, k)`` and the iteration
      count (device scalar).
    """
    mv = as_matvec(A)
    rmv = as_rmatvec(A) if rmatvec is None else rmatvec
    b2, was_vec = ensure_matrix(b)
    n, k = b2.shape
    dtype = b2.dtype
    # complex systems (reference lsmr.py:167-171): vectors stay complex,
    # all Golub-Kahan scalar recurrences live in the matching real dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    damp = jnp.asarray(settings.damp, rdtype)

    # infer m from one rmatvec application
    v_probe = rmv(jnp.zeros((n, k), dtype))
    m = v_probe.shape[0]

    if x0 is None:
        x = jnp.zeros((m, k), dtype)
        u = b2
    else:
        x = ensure_matrix(x0)[0]
        u = b2 - mv(x)

    normb = col_norms(b2)
    beta = col_norms(u)
    u = u / jnp.where(beta > 0, beta, 1.0)
    v = rmv(u)
    alpha = jnp.where(beta > 0, col_norms(v), 0.0)
    v = v / jnp.where(alpha > 0, alpha, 1.0)

    zetabar = alpha * beta
    alphabar = alpha
    rho = jnp.ones((k,), rdtype)
    rhobar = jnp.ones((k,), rdtype)
    cbar = jnp.ones((k,), rdtype)
    sbar = jnp.zeros((k,), rdtype)
    h = v
    hbar = jnp.zeros((m, k), dtype)
    # ||r|| estimation state
    betadd = beta
    betad = jnp.zeros((k,), rdtype)
    rhodold = jnp.ones((k,), rdtype)
    tautildeold = jnp.zeros((k,), rdtype)
    thetatilde = jnp.zeros((k,), rdtype)
    zeta = jnp.zeros((k,), rdtype)
    d = jnp.zeros((k,), rdtype)
    normA2 = alpha * alpha
    maxrbar = jnp.zeros((k,), rdtype)
    minrbar = jnp.full((k,), 1e30, rdtype)
    normr = beta

    already_done = zetabar == 0  # b (or residual at x0) is zero

    ctol = 1.0 / settings.conlim if settings.conlim > 0 else 0.0

    def stop_flags(st):
        (x, u, v, alpha, beta, alphabar, rho, rhobar, cbar, sbar, zetabar,
         zeta, h, hbar, betadd, betad, rhodold, tautildeold, thetatilde, d,
         normA2, maxrbar, minrbar, normr, itn) = st
        normA = jnp.sqrt(normA2)
        condA = jnp.maximum(maxrbar, rho) / jnp.maximum(
            jnp.minimum(minrbar, rho), jnp.finfo(rdtype).tiny)
        normar = jnp.abs(zetabar)
        normx = col_norms(x)
        safe_normb = jnp.where(normb > 0, normb, 1.0)
        test1 = normr / safe_normb
        test2 = normar / jnp.maximum(normA * normr, jnp.finfo(rdtype).tiny)
        test3 = 1.0 / condA
        rtol = settings.btol + settings.atol * normA * normx / safe_normb
        return ((test1 <= rtol) | (test2 <= settings.atol)
                | (test3 <= ctol) | already_done)

    def cond(st):
        itn = st[-1]
        return (~jnp.all(stop_flags(st))) & (itn < settings.max_iter)

    def body(st):
        (x, u, v, alpha, beta, alphabar, rho, rhobar, cbar, sbar, zetabar,
         zeta, h, hbar, betadd, betad, rhodold, tautildeold, thetatilde, d,
         normA2, maxrbar, minrbar, normr, itn) = st
        frozen = stop_flags(st)

        # Golub–Kahan step
        u = mv(v) - alpha * u
        beta = col_norms(u)
        u = u / jnp.where(beta > 0, beta, 1.0)
        v = rmv(u) - beta * v
        alpha = col_norms(v)
        v = v / jnp.where(alpha > 0, alpha, 1.0)

        # damping rotation
        chat, shat, alphahat = _sym_ortho(alphabar, damp)
        # plane rotation P_i
        rhoold = rho
        c, s, rho_n = _sym_ortho(alphahat, beta)
        thetanew = s * alpha
        alphabar_n = c * alpha
        # rotation Pbar_i
        rhobarold = rhobar
        zetaold = zeta
        thetabar = sbar * rho_n
        rhotemp = cbar * rho_n
        cbar_n, sbar_n, rhobar_n = _sym_ortho(cbar * rho_n, thetanew)
        zeta_n = cbar_n * zetabar
        zetabar_n = -sbar_n * zetabar

        hbar_n = h - (thetabar * rho_n / (rhoold * rhobarold)) * hbar
        x_n = x + (zeta_n / (rho_n * rhobar_n)) * hbar_n
        h_n = v - (thetanew / rho_n) * h

        # ||r|| estimate
        betaacute = chat * betadd
        betacheck = -shat * betadd
        betahat = c * betaacute
        betadd_n = -s * betaacute
        thetatildeold = thetatilde
        ctildeold, stildeold, rhotildeold = _sym_ortho(rhodold, thetabar)
        thetatilde_n = stildeold * rhobar_n
        rhodold_n = ctildeold * rhobar_n
        betad_n = -stildeold * betad + ctildeold * betahat
        tautildeold_n = (zetaold - thetatildeold * tautildeold) / \
            jnp.where(rhotildeold > 0, rhotildeold, 1.0)
        taud = (zeta_n - thetatilde_n * tautildeold_n) / \
            jnp.where(rhodold_n != 0, rhodold_n, 1.0)
        d_n = d + betacheck * betacheck
        normr_n = jnp.sqrt(d_n + (betad_n - taud) ** 2 + betadd_n ** 2)

        normA2_n = normA2 + beta * beta + alpha * alpha
        maxrbar_n = jnp.maximum(maxrbar, rhobarold)
        minrbar_n = jnp.where(itn > 0, jnp.minimum(minrbar, rhobarold),
                              minrbar)

        def sel(new, old):
            fr = frozen
            if new.ndim == 2:
                fr = frozen[None, :]
            return jnp.where(fr, old, new)

        return (sel(x_n, x), sel(u, u), sel(v, v), sel(alpha, alpha),
                sel(beta, beta), sel(alphabar_n, alphabar),
                sel(rho_n, rho), sel(rhobar_n, rhobar), sel(cbar_n, cbar),
                sel(sbar_n, sbar), sel(zetabar_n, zetabar),
                sel(zeta_n, zeta), sel(h_n, h), sel(hbar_n, hbar),
                sel(betadd_n, betadd), sel(betad_n, betad),
                sel(rhodold_n, rhodold), sel(tautildeold_n, tautildeold),
                sel(thetatilde_n, thetatilde), sel(d_n, d),
                sel(normA2_n, normA2), sel(maxrbar_n, maxrbar),
                sel(minrbar_n, minrbar), sel(normr_n, normr), itn + 1)

    st = (x, u, v, alpha, beta, alphabar, rho, rhobar, cbar, sbar, zetabar,
          zeta, h, hbar, betadd, betad, rhodold, tautildeold, thetatilde, d,
          normA2, maxrbar, minrbar, normr, jnp.array(0, jnp.int32))
    st = jax.lax.while_loop(cond, body, st)
    x, itn = st[0], st[-1]
    return (x[:, 0] if was_vec else x), itn
