"""Sparse overdetermined least squares with sparsity-preserving gradients.

TPU-native rebuild of the reference's ``sparse_generic_lstsq``
(``/root/reference/torchsparsegradutils/sparse_lstsq.py``):

* forward: pluggable ``lstsq(A, B) -> x`` (default LSMR; here the LSMR
  driver is column-vectorised, replacing the reference's per-column Python
  loop, sparse_lstsq.py:123-153);
* backward: Golub & Pereyra (1973) eq. 4.12 specialised to tall full-rank A
  (so ``A⁺A = I``):
  ``gradB = (Aᵀ)⁺ G``, and
  ``gradA = −gradB xᵀ − (Ax − B)(A⁺ gradB)ᵀ``
  with both rank-k terms sampled only at A's nonzeros
  (sparse_lstsq.py:196-262).

Like the reference, the backward calls the raw solvers (no recursion), so
first-order gradients are supported; use ``sparse_generic_solve`` when
higher-order gradients of a square system are needed.

Example:
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> from torchsparsegradutils_tpu import SparseCOO, sparse_generic_lstsq
    >>> rows = np.array([0, 1, 2, 3, 3]); cols = np.array([0, 1, 0, 1, 0])
    >>> A = SparseCOO(rows, cols, jnp.array([2.0, 1.0, 1.0, 3.0, 0.5]),
    ...               (4, 2))
    >>> b = jnp.array([1.0, 2.0, 0.5, 1.5])
    >>> x = sparse_generic_lstsq(A, b)
    >>> ref = jnp.linalg.lstsq(A.todense(), b)[0]
    >>> bool(jnp.allclose(x, ref, atol=1e-4))
    True
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..types import is_sparse
from .common import sparse_cotangent
from .spmm import sddmm, sparse_mm

__all__ = ["sparse_generic_lstsq"]


@lru_cache(maxsize=1)
def _default_lstsq():
    from ..solvers import lsmr

    def solve(A, B, **kw):
        return lsmr(A, B, **kw)[0]

    return solve


@lru_cache(maxsize=1)
def _default_transpose_lstsq():
    from ..solvers import lsmr

    def solve(A, B, **kw):
        return lsmr(A.T, B, **kw)[0]

    return solve


@lru_cache(maxsize=None)
def _lstsq_cv(lstsq: Callable, transpose_lstsq: Callable, fkw: tuple):
    kwargs = dict(fkw)

    @jax.custom_vjp
    def f(A, B):
        return lstsq(A, B, **kwargs)

    def fwd(A, B):
        x = f(A, B)
        return x, (A, B, x)

    def bwd(res, g):
        A, B, x = res
        B2 = B[:, None] if B.ndim == 1 else B
        x2 = x[:, None] if x.ndim == 1 else x
        g2 = g[:, None] if g.ndim == 1 else g
        gradB = transpose_lstsq(A, g2, **kwargs)
        if gradB.ndim == 1:
            gradB = gradB[:, None]
        # term 1: -gradB x^T at nnz
        u1 = -sddmm(A, gradB, x2).data
        # term 2: (B - A x)(A^+ gradB)^T at nnz
        mresid = B2 - sparse_mm(A, x2)
        apgb = lstsq(A, gradB, **kwargs)
        if apgb.ndim == 1:
            apgb = apgb[:, None]
        u2 = sddmm(A, mresid, apgb).data
        d_B = gradB[:, 0] if g.ndim == 1 else gradB
        return sparse_cotangent(A, u1 + u2), d_B

    f.defvjp(fwd, bwd)
    return f


def sparse_generic_lstsq(A, B, lstsq: Optional[Callable] = None,
                         transpose_lstsq: Optional[Callable] = None,
                         **kwargs):
    """Solve ``min_x ‖A x − B‖₂²`` for tall full-column-rank sparse ``A``.

    Args:
      A: ``(m, n)`` sparse container with ``m >= n`` (full column rank
        assumed, as in the reference; not verified for cost reasons).
      B: dense ``(m,)`` or ``(m, k)``.
      lstsq: ``lstsq(A, B) -> x``; default LSMR.
      transpose_lstsq: solver for the transpose problem ``(Aᵀ) Y = G`` used
        in backward; default LSMR on ``Aᵀ``.
      **kwargs: forwarded to both solvers in forward and backward (must be
        hashable, e.g. ``settings=LSMRSettings(...)``) — reference
        contract (sparse_lstsq.py kwargs passthrough).

    Returns:
      ``x`` of shape ``(n,)`` / ``(n, k)``.
    """
    if not is_sparse(A):
        raise TypeError("sparse_generic_lstsq: A must be SparseCOO/SparseCSR")
    if is_sparse(B):
        raise TypeError("sparse_generic_lstsq: B must be a dense array")
    B = B if isinstance(B, jax.core.Tracer) else jnp.asarray(B)
    if A.ndim != 2:
        raise ValueError("sparse_generic_lstsq: A must be a 2-D matrix")
    if A.shape[1] > A.shape[0]:
        raise ValueError(
            f"sparse_generic_lstsq: A should be a tall full-rank matrix, "
            f"got shape {A.shape}")
    if B.ndim not in (1, 2):
        raise ValueError("sparse_generic_lstsq: B must be 1-D or 2-D")
    if B.shape[0] != A.shape[0]:
        raise ValueError(
            f"sparse_generic_lstsq: incompatible shapes, A {A.shape} vs "
            f"B {B.shape}")

    if lstsq is None:
        lstsq = _default_lstsq()
    if transpose_lstsq is None:
        transpose_lstsq = _default_transpose_lstsq()
    from .common import freeze_kwargs
    x = _lstsq_cv(lstsq, transpose_lstsq, freeze_kwargs(kwargs))(A, B)
    if B.ndim == 1 and x.ndim == 2 and x.shape[1] == 1:
        x = x[:, 0]
    elif B.ndim == 2 and x.ndim == 1:
        x = x[:, None]
    return x
