"""Pluggable-solver sparse linear solve with implicit-function-theorem
gradients.

TPU-native rebuild of the reference's ``sparse_generic_solve``
(``/root/reference/torchsparsegradutils/sparse_solve.py:257-521``):

* forward: any ``solve(A, B, **kwargs) -> x`` callable — including
  non-differentiable ones (``lax.while_loop`` Krylov drivers, foreign
  host-callback solvers) — default MINRES (:407-416);
* backward (implicit function theorem, :456-521):
  ``gradB = A⁻ᵀ G`` computed by *recursively* calling
  ``sparse_generic_solve`` with ``solve``/``transpose_solve`` swapped —
  building a fresh differentiable node so higher-order gradients work
  (:467-473, tested at tests/test_sparse_solve.py:391-441) — and
  ``gradA[i,j] = −dot(gradB[i,:], x[j,:])`` sampled at A's nonzeros via the
  shared :func:`~torchsparsegradutils_tpu.ops.spmm.sddmm` primitive.

``transpose_solve(A, G, **kwargs)`` must solve ``Aᵀ Y = G`` (the matrix is
passed untransposed, matching the reference's contract).  The default
MINRES assumes symmetry, so ``transpose_solve = solve``.

Example:
    >>> import jax, jax.numpy as jnp
    >>> from torchsparsegradutils_tpu import sparse_generic_solve
    >>> from torchsparsegradutils_tpu.solvers import linear_cg, LinearCGSettings
    >>> from torchsparsegradutils_tpu.utils import make_spd_sparse
    >>> A = make_spd_sparse(jax.random.PRNGKey(0), 16, 16 + 2 * 20)
    >>> b = jnp.ones((16,))
    >>> x = sparse_generic_solve(A, b, solve=linear_cg,
    ...                          settings=LinearCGSettings(max_iter=100))
    >>> bool(jnp.allclose(A.todense() @ x, b, atol=1e-3))
    True
"""

from __future__ import annotations

import warnings
from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..types import is_sparse
from .common import freeze_kwargs, sparse_cotangent
from .spmm import sddmm

__all__ = ["sparse_generic_solve"]


def _default_solver():
    from ..solvers import minres
    return minres


@lru_cache(maxsize=None)
def _solve_cv(solve: Callable, transpose_solve: Callable, fkw: tuple):
    """Cached custom-vjp wrapper per (solver pair, frozen kwargs)."""
    kwargs = dict(fkw)

    @jax.custom_vjp
    def f(A, B):
        x = solve(A, B, **kwargs)
        if x.dtype != A.dtype:
            x = x.astype(A.dtype)
        return x

    def fwd(A, B):
        x = f(A, B)
        return x, (A, x)

    def bwd(res, g):
        A, x = res
        gradB = sparse_generic_solve(A, g, solve=transpose_solve,
                                     transpose_solve=solve, **kwargs)
        if gradB.dtype != A.dtype:
            gradB = gradB.astype(A.dtype)
        # gradA[i,j] = -dot(gradB[i,:], x[j,:]) at A's nonzeros
        gradB2 = gradB[:, None] if gradB.ndim == 1 else gradB
        x2 = x[:, None] if x.ndim == 1 else x
        vals = -sddmm(A, gradB2, x2).data
        return sparse_cotangent(A, vals), gradB

    f.defvjp(fwd, bwd)
    return f


def sparse_generic_solve(A, B, solve: Optional[Callable] = None,
                         transpose_solve: Optional[Callable] = None,
                         **kwargs):
    """Solve ``A x = B`` (square sparse A) with a pluggable solver and
    sparsity-preserving IFT gradients.

    Args:
      A: ``(n, n)`` sparse container.
      B: dense ``(n,)`` or ``(n, k)``.
      solve: ``solve(A, B, **kwargs) -> x``; default MINRES.
      transpose_solve: solver for ``Aᵀ Y = G`` in the backward pass
        (receives A untransposed); defaults to ``solve``.
      **kwargs: forwarded to both solvers in forward and backward (must be
        hashable, e.g. frozen settings dataclasses).

    Returns:
      ``x`` shaped like ``B``.
    """
    if not is_sparse(A):
        raise TypeError("sparse_generic_solve: A must be SparseCOO/SparseCSR")
    if is_sparse(B):
        raise TypeError("sparse_generic_solve: B must be a dense array")
    B = B if isinstance(B, jax.core.Tracer) else jnp.asarray(B)
    if A.ndim != 2:
        raise ValueError("sparse_generic_solve: A must be a 2-D matrix")
    if A.shape[0] != A.shape[1]:
        raise ValueError("sparse_generic_solve: A must be square")
    if B.ndim not in (1, 2):
        raise ValueError("sparse_generic_solve: B must be 1-D or 2-D")
    if B.shape[0] != A.shape[0]:
        raise ValueError(
            f"sparse_generic_solve: incompatible shapes, A {A.shape} vs "
            f"B {B.shape}")
    if A.dtype != B.dtype:
        warnings.warn(
            f"sparse_generic_solve: A and B have different dtypes "
            f"(A={A.dtype}, B={B.dtype}); this may affect solver behaviour",
            UserWarning, stacklevel=2)

    if solve is None and transpose_solve is None:
        solve = transpose_solve = _default_solver()
    elif solve is None:
        solve = transpose_solve
    elif transpose_solve is None:
        transpose_solve = solve

    f = _solve_cv(solve, transpose_solve, freeze_kwargs(kwargs))
    x = f(A, B)
    # rank normalisation (solver may return (n,1) for vector B or vice versa)
    if B.ndim == 1 and x.ndim == 2 and x.shape[1] == 1:
        x = x[:, 0]
    elif B.ndim == 2 and x.ndim == 1:
        x = x[:, None]
    return x
