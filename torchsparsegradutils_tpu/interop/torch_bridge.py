"""Torch ↔ JAX interop: converters and torch-frontend sparse autograd ops.

The reference's interop layer (``/root/reference/torchsparsegradutils/jax/``)
lets *torch* users offload solves to JAX (``sparse_solve_j4t``,
jax_sparse_solve.py:11-258) over DLPack converters
(jax_bindings.py:43-313).  In this library the frameworks swap roles: JAX
is native, and this module is the bridge that lets torch code call the
TPU sparse kernels with torch autograd intact:

* ``t2j`` / ``j2t`` — dense tensor converters (jax_bindings.py:43-110).
* ``t2j_coo`` / ``t2j_csr`` — torch sparse tensors → this library's
  containers (jax_bindings.py:161-313); ``j2t_coo`` / ``j2t_csr`` back.
* ``sparse_mm_j4t(A, B)`` — torch-autograd SpMM running on the JAX/TPU
  kernels; gradA lands as a sparse torch tensor at A's nonzeros.
* ``sparse_solve_j4t(A, B, ...)`` — torch-autograd sparse solve backed by
  this library's Krylov solvers with the IFT backward.

Transfers go through host memory (``numpy``) — torch here is CPU-only and
the JAX device is a TPU, so zero-copy DLPack does not apply; the reference
hits the same boundary when devices differ (jax_sparse_solve.py:169-176).
Torch is an optional dependency: importing this module without torch
raises a clear ImportError.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import torch
    have_torch = True
except ImportError:  # pragma: no cover
    torch = None
    have_torch = False

from ..ops.solve import sparse_generic_solve
from ..ops.spmm import sparse_mm
from ..types import SparseCOO, SparseCSR

__all__ = [
    "have_torch",
    "t2j",
    "j2t",
    "t2j_coo",
    "t2j_csr",
    "j2t_coo",
    "j2t_csr",
    "sparse_mm_j4t",
    "sparse_solve_j4t",
]


def _need_torch():
    if not have_torch:
        raise ImportError(
            "torch is required for the interop bridge (pip install torch)")


def t2j(tensor) -> jax.Array:
    """torch.Tensor -> jax array on the default device."""
    _need_torch()
    return jnp.asarray(tensor.detach().cpu().numpy())


def j2t(array):
    """jax array -> torch CPU tensor."""
    _need_torch()
    return torch.from_numpy(np.asarray(array))


def t2j_coo(tensor) -> SparseCOO:
    """torch sparse COO tensor -> SparseCOO (coalesced, static pattern)."""
    _need_torch()
    if tensor.layout != torch.sparse_coo:
        raise TypeError(f"expected torch.sparse_coo, got {tensor.layout}")
    t = tensor.detach().coalesce()
    idx = t.indices().cpu().numpy()
    if idx.shape[0] != 2:
        raise ValueError("only 2-D torch sparse tensors are supported")
    return SparseCOO(idx[0], idx[1], jnp.asarray(t.values().cpu().numpy()),
                     tuple(t.shape))


def t2j_csr(tensor) -> SparseCSR:
    """torch sparse CSR tensor -> SparseCSR (static pattern)."""
    _need_torch()
    if tensor.layout != torch.sparse_csr:
        raise TypeError(f"expected torch.sparse_csr, got {tensor.layout}")
    t = tensor.detach()
    return SparseCSR(t.crow_indices().cpu().numpy(),
                     t.col_indices().cpu().numpy(),
                     jnp.asarray(t.values().cpu().numpy()),
                     tuple(t.shape))


def j2t_coo(sp: SparseCOO):
    """SparseCOO -> torch sparse COO tensor (CPU)."""
    _need_torch()
    idx = np.stack([np.asarray(sp.rows()), np.asarray(sp.cols())])
    return torch.sparse_coo_tensor(torch.from_numpy(idx.astype(np.int64)),
                                   torch.from_numpy(np.asarray(sp.data)),
                                   size=sp.shape)


def j2t_csr(sp: SparseCSR):
    """SparseCSR -> torch sparse CSR tensor (CPU)."""
    _need_torch()
    return torch.sparse_csr_tensor(
        torch.from_numpy(np.asarray(sp.indptr_arr()).astype(np.int64)),
        torch.from_numpy(np.asarray(sp.cols()).astype(np.int64)),
        torch.from_numpy(np.asarray(sp.data)), size=sp.shape)


def _t2j_sparse(tensor):
    if tensor.layout == torch.sparse_coo:
        return t2j_coo(tensor)
    if tensor.layout == torch.sparse_csr:
        return t2j_csr(tensor)
    raise TypeError(f"unsupported torch sparse layout {tensor.layout}")


def _wrap_grad_as_torch_sparse(A_torch, grad_vals: np.ndarray):
    """Rebuild gradA as a torch sparse tensor with A's layout/indices."""
    if A_torch.layout == torch.sparse_coo:
        t = A_torch.detach().coalesce()
        return torch.sparse_coo_tensor(t.indices(),
                                       torch.from_numpy(grad_vals),
                                       size=t.shape)
    return torch.sparse_csr_tensor(A_torch.crow_indices(),
                                   A_torch.col_indices(),
                                   torch.from_numpy(grad_vals),
                                   size=A_torch.shape)


def _make_torch_function(jax_fn: Callable):
    """torch.autograd.Function running ``jax_fn(A_container, B) -> y`` with
    gradients pulled back through ``jax.vjp``."""

    class _Fn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, values, B, A_torch, pattern):
            def f(vals_j, B_j):
                return jax_fn(pattern.with_data(vals_j), B_j)

            vals_j = jnp.asarray(values.detach().cpu().numpy())
            B_j = jnp.asarray(B.detach().cpu().numpy())
            y, vjp = jax.vjp(f, vals_j, B_j)
            ctx.vjp = vjp
            return torch.from_numpy(np.asarray(y))

        @staticmethod
        def backward(ctx, grad):
            g_j = jnp.asarray(grad.detach().cpu().numpy())
            d_vals, d_B = ctx.vjp(g_j)
            return (torch.from_numpy(np.asarray(d_vals)),
                    torch.from_numpy(np.asarray(d_B)), None, None)

    return _Fn


def _torch_sparse_values(A_torch):
    if A_torch.layout == torch.sparse_coo:
        return A_torch.coalesce().values()
    return A_torch.values()


def _apply_j4t(jax_fn, A_torch, B_torch):
    _need_torch()
    pattern = _t2j_sparse(A_torch)
    Fn = _make_torch_function(jax_fn)
    values = _torch_sparse_values(A_torch)
    y = Fn.apply(values, B_torch, A_torch, pattern)
    return y


def sparse_mm_j4t(A_torch, B_torch):
    """Torch-frontend SpMM on the JAX/TPU kernels with torch autograd.

    A: torch sparse COO/CSR (2-D); B: dense torch tensor.  Gradients
    w.r.t. A flow to ``A.values()`` (use ``values.requires_grad_()``), and
    to B as usual.  The inverse of the reference's ``sparse_solve_j4t``
    framing: here torch is the guest frontend.
    """
    return _apply_j4t(lambda A, B: sparse_mm(A, B), A_torch, B_torch)


def sparse_solve_j4t(A_torch, B_torch, solve: Optional[Callable] = None,
                     transpose_solve: Optional[Callable] = None, **kwargs):
    """Torch-frontend sparse solve backed by this library's Krylov solvers
    (IFT backward).  Mirrors the reference's ``sparse_solve_j4t`` API
    (jax_sparse_solve.py:11-128) with the frameworks swapped."""
    return _apply_j4t(
        lambda A, B: sparse_generic_solve(
            A, B, solve=solve, transpose_solve=transpose_solve, **kwargs),
        A_torch, B_torch)
