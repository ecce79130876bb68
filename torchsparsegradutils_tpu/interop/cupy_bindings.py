"""CuPy/SciPy sparse-matrix converters for this library's containers.

Parity with the reference's converter family
(``/root/reference/torchsparsegradutils/cupy/cupy_bindings.py``):

* ``_get_array_modules`` (:55-95): pick the (array, sparse) module pair by
  where the data lives — there CUDA→(cupy, cupyx.scipy.sparse) vs
  CPU→(numpy, scipy.sparse); here cupy is selected only when it is both
  installed and the array already lives on a CUDA device, which on a TPU
  host resolves to (numpy, scipy.sparse).
* ``t2c_csr`` / ``c2t_csr`` / ``t2c_coo`` / ``c2t_coo`` (:98-259) become
  ``j2c_csr`` / ``c2j_csr`` / ``j2c_coo`` / ``c2j_coo`` — "j" for this
  library's JAX-backed containers.  The reference moves data zero-copy
  over DLPack on CUDA; between a TPU and CuPy no such path exists, so the
  transfer is an explicit host round-trip (device_get / device_put),
  which is also the honest cost model (the reference's own benchmarks
  show the conversion dominating, BASELINE.md cupy rows).

Like the reference, converting a COO container implies a coalesce-to-
canonical-order guarantee on the output (cupy_bindings.py:218-221 warns on
implicit coalesce; our containers are canonically sorted already, so the
round-trip preserves entry order bit-for-bit).
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - cupy is absent on TPU hosts; gated like the
    import cupy as _cp                 # reference (cupy/__init__.py:1-12)
    import cupyx.scipy.sparse as _cpx
    have_cupy = True
except Exception:  # ImportError or CUDA init failure
    _cp = None
    _cpx = None
    have_cupy = False

try:
    import scipy.sparse as _sps
    have_scipy = True
except ImportError:  # pragma: no cover
    _sps = None
    have_scipy = False

import jax
import jax.numpy as jnp

from ..types import SparseCOO, SparseCSR, is_sparse

__all__ = [
    "have_cupy",
    "j2c_csr",
    "c2j_csr",
    "j2c_coo",
    "c2j_coo",
    "_get_array_modules",
]


def _get_array_modules(arr):
    """(xp, xsparse) module pair for ``arr``'s home — the reference's
    device dispatch (cupy_bindings.py:55-95).

    CuPy modules are returned only when cupy is importable AND the array
    is a cupy array already (a TPU/CPU jax array has no zero-copy route
    to CUDA); everything else resolves to (numpy, scipy.sparse).
    """
    if have_cupy and isinstance(arr, _cp.ndarray):
        return _cp, _cpx
    if not have_scipy:  # pragma: no cover
        raise ImportError("scipy is required for sparse conversions")
    return np, _sps


def _host(x):
    return np.asarray(jax.device_get(x))


def j2c_csr(A: SparseCSR):
    """SparseCSR → ``scipy.sparse.csr_matrix`` (or ``cupyx`` csr when cupy
    is active).  Reference: ``t2c_csr`` (cupy_bindings.py:98-142)."""
    if not is_sparse(A) or A.layout != "csr":
        raise TypeError("j2c_csr expects a SparseCSR container")
    if A.ndim != 2:
        raise ValueError("j2c_csr supports 2-D (unbatched) matrices")
    xp, xs = _get_array_modules(A.data)
    indptr = np.asarray(A.indptr_np())
    indices = np.asarray(A.cols_np())
    data = _host(A.data)
    return xs.csr_matrix((xp.asarray(data), xp.asarray(indices),
                          xp.asarray(indptr)), shape=A.mat_shape)


def c2j_csr(M, *, pattern_static: bool = True) -> SparseCSR:
    """``scipy``/``cupyx`` csr_matrix → SparseCSR.  Reference:
    ``c2t_csr`` (cupy_bindings.py:145-186)."""
    if have_cupy and isinstance(M, _cpx.spmatrix):  # pragma: no cover
        M = M.get()
    if not have_scipy or not _sps.issparse(M):
        raise TypeError(f"c2j_csr expects a scipy/cupy sparse matrix, got "
                        f"{type(M).__name__}")
    M = M.tocsr()
    M.sort_indices()
    return SparseCSR(np.asarray(M.indptr), np.asarray(M.indices),
                     jnp.asarray(M.data), M.shape,
                     pattern_static=pattern_static)


def j2c_coo(A: SparseCOO):
    """SparseCOO → ``scipy.sparse.coo_matrix`` (or ``cupyx`` coo).
    Reference: ``t2c_coo`` (cupy_bindings.py:189-224)."""
    if not is_sparse(A) or A.layout != "coo":
        raise TypeError("j2c_coo expects a SparseCOO container")
    if A.ndim != 2:
        raise ValueError("j2c_coo supports 2-D (unbatched) matrices")
    xp, xs = _get_array_modules(A.data)
    rows = np.asarray(A.rows_np())
    cols = np.asarray(A.cols_np())
    data = _host(A.data)
    return xs.coo_matrix((xp.asarray(data),
                          (xp.asarray(rows), xp.asarray(cols))),
                         shape=A.mat_shape)


def c2j_coo(M, *, pattern_static: bool = True) -> SparseCOO:
    """``scipy``/``cupyx`` coo_matrix → SparseCOO (canonically sorted,
    duplicates coalesced).  Reference: ``c2t_coo``
    (cupy_bindings.py:227-259)."""
    if have_cupy and isinstance(M, _cpx.spmatrix):  # pragma: no cover
        M = M.get()
    if not have_scipy or not _sps.issparse(M):
        raise TypeError(f"c2j_coo expects a scipy/cupy sparse matrix, got "
                        f"{type(M).__name__}")
    M = M.tocoo()
    M.sum_duplicates()  # canonical row-major sorted order (our invariant)
    return SparseCOO(np.asarray(M.row), np.asarray(M.col),
                     jnp.asarray(M.data), M.shape,
                     pattern_static=pattern_static)
