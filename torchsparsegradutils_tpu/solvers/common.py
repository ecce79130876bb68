"""Shared plumbing for the Krylov solvers.

The solvers are ``jax.lax.while_loop`` drivers over a matvec closure — the
TPU-native analogue of the reference's pure-PyTorch Krylov loops
(``/root/reference/torchsparsegradutils/utils/{linear_cg,bicgstab,minres,
lsmr}.py``).  Python-loop early exit becomes a converged-mask predicate in
the while condition; per-column freezing masks reproduce the reference's
"stop updating converged columns" behaviour without host syncs.

Settings are frozen dataclasses (hashable → usable as static jit arguments
and forwardable through ``sparse_generic_solve``'s cached custom-VJP
builders), mirroring the reference's NamedTuple settings objects
(linear_cg.py:10-20, bicgstab.py:14-19, minres.py:9-13).
"""

from __future__ import annotations

import warnings
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import is_sparse


class SolveInfo(NamedTuple):
    """Solver diagnostics (reference parity: ``linear_cg`` warns on
    non-convergence at utils/linear_cg.py:413-423, ``lsmr`` returns its
    iteration count, ``bicgstab`` takes a logger at bicgstab.py:9-19 —
    this one structure covers all three needs).

    Attributes:
      iterations: int32 scalar — while_loop steps taken.
      residual: final absolute residual norm(s), per RHS column (and per
        shift for multi-shift MINRES).
      converged: bool mask matching ``residual`` — True where the
        solver's own stopping criterion was met before ``max_iter``.
    """
    iterations: jax.Array
    residual: jax.Array
    converged: jax.Array


def maybe_warn_not_converged(info: SolveInfo, name: str) -> None:
    """Reference-parity non-convergence warning (linear_cg.py:413-423).

    Fires only for *concrete* (eager) values — under ``jit`` there is no
    host value to test, so traced solves stay silent; request
    ``diagnostics=True`` and inspect the returned :class:`SolveInfo`
    instead."""
    conv = info.converged
    if isinstance(conv, jax.core.Tracer):
        return
    try:
        ok = bool(np.all(np.asarray(conv)))
        if ok:
            return
        iters = int(np.asarray(info.iterations))
        worst = float(np.max(np.asarray(info.residual)))
    except Exception:  # noqa: BLE001 - diagnostics must never break a solve
        return
    warnings.warn(
        f"{name}: did not converge after {iters} iterations "
        f"(worst residual {worst:.3e}); the returned solution is the "
        "final iterate", UserWarning, stacklevel=3)


def _dia_matvec(A, transpose: bool):
    """Hoisted DIA matvec: the value-grid relayout runs once at closure
    build time (i.e. *outside* the solver's ``lax.while_loop``) instead of
    on every Krylov iteration.  None if the pattern is not DIA."""
    from ..kernels.dia import prepared_matvec
    from ..ops.spmm import _dia_plan

    dplan = _dia_plan(A, "auto")
    if dplan is None:
        return None
    core = prepared_matvec(dplan, A.data, transpose)

    def mv(x):
        if x.ndim == 1:
            return core(x[:, None])[:, 0]
        return core(x)

    return mv


def as_matvec(A) -> Callable:
    """Normalise a matrix-like into a closure acting on (n,) or (n, k)."""
    if callable(A) and not is_sparse(A) and not isinstance(A, jnp.ndarray):
        return A
    if is_sparse(A):
        mv_dia = _dia_matvec(A, transpose=False)
        if mv_dia is not None:
            return mv_dia
        from ..ops.spmm import sparse_mm

        def mv(x):
            if x.ndim == 1:
                return sparse_mm(A, x[:, None])[:, 0]
            return sparse_mm(A, x)

        return mv
    A_arr = jnp.asarray(A) if not isinstance(A, jax.core.Tracer) else A

    def mv_dense(x):
        return A_arr @ x

    return mv_dense


def as_rmatvec(A) -> Callable:
    """Adjoint matvec for a matrix-like (needed by LSMR): ``Aᵀ`` for real
    operators, ``Aᴴ`` for complex (reference lsmr.py:167-171)."""
    if is_sparse(A):
        mv_dia = _dia_matvec(A, transpose=True)
        base = mv_dia if mv_dia is not None else as_matvec(A.T)
        if jnp.issubdtype(A.dtype, jnp.complexfloating):
            return lambda x: jnp.conj(base(jnp.conj(x)))
        return base
    if callable(A) and not isinstance(A, jnp.ndarray):
        raise ValueError(
            "a callable matmul closure needs an explicit transpose closure "
            "(pass rmatvec=...)")
    A_arr = jnp.asarray(A) if not isinstance(A, jax.core.Tracer) else A
    return lambda x: A_arr.T @ x


def ensure_matrix(b):
    """(n,) -> (n, 1); returns (b2d, was_vector)."""
    b = b if isinstance(b, jax.core.Tracer) else jnp.asarray(b)
    if b.ndim == 1:
        return b[:, None], True
    if b.ndim == 2:
        return b, False
    raise ValueError(f"rhs must be 1-D or 2-D, got {b.ndim}-D")


def col_norms(x):
    """Real column 2-norms (complex-safe: |x|² via conjugation)."""
    if jnp.iscomplexobj(x):
        return jnp.sqrt(jnp.sum((x * jnp.conj(x)).real, axis=0))
    return jnp.sqrt(jnp.sum(x * x, axis=0))


def safe_div(a, b, eps=None):
    eps = eps or jnp.finfo(a.dtype).tiny
    return a / jnp.where(jnp.abs(b) > eps, b, jnp.where(b >= 0, eps, -eps))
