"""Host-callback scipy sparse solvers pluggable into sparse_generic_solve.

Parity with the reference's CuPy/SciPy backend (``sparse_solve_c4t``,
``/root/reference/torchsparsegradutils/cupy/cupy_sparse_solve.py``): a
string registry of scipy.sparse.linalg solvers ("cg", "cgs", "minres",
"gmres", "spsolve"), signature introspection with tolerance-name remapping
(:12-56, :74-93), vector-RHS-only guards for the iterative methods
(:227-240), and a default direct ``spsolve``.

TPU-native difference: the foreign solver runs on host via
``jax.pure_callback`` inside the solve closure; gradients come from
``sparse_generic_solve``'s implicit-function-theorem backward, so the host
solver never needs to be differentiable — exactly the reference's design
point (the solver is a black box; only ``A x = B`` at the solution
matters).

Platform note: *traced* host callbacks (inside ``jit``) require a runtime
with send/recv support (standard CPU/GPU/TPU runtimes have it; some
experimental PJRT plugins — e.g. tunnelled axon TPUs — do not and raise
UNIMPLEMENTED).  With concrete operands (the normal eager call) the solve
runs directly on host with no callback machinery, so
``sparse_solve_scipy`` works on those runtimes too — just don't wrap it
in ``jit`` there."""

from __future__ import annotations

import hashlib
import inspect
from typing import Callable

import jax
import numpy as np

try:
    import scipy.sparse as _sps
    import scipy.sparse.linalg as _spl
    have_scipy = True
except ImportError:  # pragma: no cover
    have_scipy = False

from ..ops.solve import sparse_generic_solve
from ..types import is_sparse

__all__ = ["have_scipy", "sparse_solve_scipy", "scipy_solver"]

_ITERATIVE = {"cg", "cgs", "minres", "gmres", "bicgstab", "lsmr"}
_DIRECT = {"spsolve"}

# Host-side LU cache: the forward solve factorises A once and the IFT
# backward reuses it with a transposed solve — the reference's
# ``factorized(A)`` + ``trans="T"`` reuse (cupy_sparse_solve.py:314-323).
# Keyed on (pattern identity, value bytes); small FIFO.
_LU_CACHE: dict = {}
_LU_CACHE_MAX = 8


def _lu_for(pat_key, data64, M_csc):
    key = (pat_key, hashlib.sha1(data64.tobytes()).digest())
    lu = _LU_CACHE.get(key)
    if lu is None:
        lu = _spl.splu(M_csc)
        if len(_LU_CACHE) >= _LU_CACHE_MAX:
            _LU_CACHE.pop(next(iter(_LU_CACHE)))
        _LU_CACHE[key] = lu
    return lu


def _remap_tol_kwargs(fn: Callable, kwargs: dict) -> dict:
    """Adapt tolerance kwarg names to the solver's signature (reference
    ``_wrap_iterative_solver``, cupy_sparse_solve.py:12-56)."""
    params = inspect.signature(fn).parameters
    out = dict(kwargs)
    if "tol" in out and "tol" not in params and "rtol" in params:
        out["rtol"] = out.pop("tol")
    if "rtol" in out and "rtol" not in params and "tol" in params:
        out["tol"] = out.pop("rtol")
    return {k: v for k, v in out.items() if k in params}


from functools import lru_cache


@lru_cache(maxsize=None)
def _scipy_solver_cached(method: str, transpose: bool, fkw: tuple):
    return _make_scipy_solver(method, transpose, dict(fkw))


def scipy_solver(method: str = "spsolve", transpose: bool = False,
                 **solver_kwargs) -> Callable:
    """Cached builder so repeated calls share one solver identity (keeps
    sparse_generic_solve's custom-VJP cache small)."""
    return _scipy_solver_cached(method, transpose,
                                tuple(sorted(solver_kwargs.items())))


def _make_scipy_solver(method: str, transpose: bool,
                       solver_kwargs: dict) -> Callable:
    """Build a ``solve(A, B, **kw)`` callable running scipy on host.

    Suitable for the ``solve=`` / ``transpose_solve=`` arguments of
    :func:`sparse_generic_solve`.  ``transpose=True`` solves ``Aᵀx = b``.
    """
    if not have_scipy:
        raise ImportError("scipy is required for the scipy solver backend")
    if method not in _ITERATIVE | _DIRECT:
        raise ValueError(
            f"unknown scipy solver {method!r}; expected one of "
            f"{sorted(_ITERATIVE | _DIRECT)}")

    def solve(A, B, **kwargs):
        if not is_sparse(A):
            raise TypeError("scipy_solver expects a sparse container")
        rows = A.rows_np("scipy host solve")
        cols = A.cols_np("scipy host solve")
        n = A.shape[0]
        was_vec = B.ndim == 1
        B2 = B[:, None] if was_vec else B
        if method in _ITERATIVE and B2.shape[1] != 1:
            raise ValueError(
                f"scipy iterative solver {method!r} supports a single RHS "
                "vector only (reference guard, cupy_sparse_solve.py:227-240)")

        pat_key = (rows.tobytes(), cols.tobytes())

        def host_solve(data, Bh):
            data64 = np.asarray(data, np.float64)
            if method == "spsolve":
                # factorise the *untransposed* matrix so forward and IFT
                # backward share one LU; the backward solves with trans="T"
                M = _sps.csc_matrix((data64, (rows, cols)), shape=(n, n))
                lu = _lu_for(pat_key, data64, M)
                x = lu.solve(np.asarray(Bh, np.float64),
                             trans="T" if transpose else "N")
                x = np.asarray(x).reshape(Bh.shape)
            else:
                M = _sps.csr_matrix((data64, (rows, cols)), shape=(n, n))
                if transpose:
                    M = M.T.tocsr()
                fn = getattr(_spl, method)
                kw = _remap_tol_kwargs(fn, {**solver_kwargs, **kwargs})
                x, info = fn(M, np.asarray(Bh[:, 0], np.float64), **kw)
                x = x[:, None]
            return x.astype(np.asarray(Bh).dtype)

        # Eager host path: with concrete operands (outside jit) the solve
        # runs directly on host — no send/recv needed, so this works on
        # runtimes whose PJRT plugin lacks host callbacks (tunnelled axon
        # TPUs).  Inside jit the traced path uses pure_callback, which
        # needs a standard runtime.
        import jax.numpy as jnp
        if not (isinstance(A.data, jax.core.Tracer)
                or isinstance(B2, jax.core.Tracer)):
            out = host_solve(np.asarray(A.data), np.asarray(B2))
            x = jnp.asarray(out)
        else:
            x = jax.pure_callback(
                host_solve, jax.ShapeDtypeStruct(B2.shape, B2.dtype),
                A.data, B2)
        return x[:, 0] if was_vec else x

    return solve


def sparse_solve_scipy(A, B, method: str = "spsolve", **kwargs):
    """Sparse solve with a scipy host solver and sparse IFT gradients.

    The analogue of the reference's ``sparse_solve_c4t``
    (cupy_sparse_solve.py:96-266): a foreign (non-JAX) solver in the
    forward, this library's sparsity-preserving implicit-function-theorem
    backward.  The transpose solve reuses the same method on ``Aᵀ``
    (reference: cached factorisation with ``trans="T"``, :314-323).
    """
    return sparse_generic_solve(
        A, B,
        solve=scipy_solver(method, transpose=False, **kwargs),
        transpose_solve=scipy_solver(method, transpose=True, **kwargs))
