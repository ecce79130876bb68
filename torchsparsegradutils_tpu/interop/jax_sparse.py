"""Converters to/from ``jax.experimental.sparse`` (BCOO / BCSR).

Ecosystem bridge: lets users move between this library's pattern-static
containers and the stock JAX sparse types (whose indices are traced
leaves).  The analogue of the reference's cross-framework sparse
converters (jax_bindings.py:161-313) for the in-JAX ecosystem.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..types import SparseCOO, SparseCSR

try:
    from jax.experimental import sparse as jsparse
    have_jax_sparse = True
except ImportError:  # pragma: no cover
    have_jax_sparse = False

__all__ = ["have_jax_sparse", "to_bcoo", "from_bcoo", "to_bcsr",
           "from_bcsr"]


def _need():
    if not have_jax_sparse:
        raise ImportError("jax.experimental.sparse is unavailable")


def to_bcoo(sp) -> "jsparse.BCOO":
    """SparseCOO/SparseCSR -> jax.experimental.sparse.BCOO (2-D)."""
    _need()
    coo = sp.tocoo()
    if coo.ndim != 2:
        raise ValueError("to_bcoo supports 2-D containers")
    idx = jnp.stack([jnp.asarray(coo.rows()), jnp.asarray(coo.cols())],
                    axis=1)
    return jsparse.BCOO((coo.data, idx), shape=coo.shape)


def from_bcoo(mat, *, pattern_static: bool = True) -> SparseCOO:
    """BCOO -> SparseCOO.  Static patterns need concrete indices."""
    _need()
    if mat.ndim != 2:
        raise ValueError("from_bcoo supports 2-D matrices")
    idx = mat.indices
    if pattern_static:
        idx = np.asarray(idx)
        return SparseCOO(idx[:, 0], idx[:, 1], mat.data, mat.shape)
    return SparseCOO(idx[:, 0], idx[:, 1], mat.data, mat.shape,
                     pattern_static=False)


def to_bcsr(sp) -> "jsparse.BCSR":
    """SparseCOO/SparseCSR -> jax.experimental.sparse.BCSR (2-D)."""
    _need()
    csr = sp.tocsr()
    if csr.ndim != 2:
        raise ValueError("to_bcsr supports 2-D containers")
    return jsparse.BCSR(
        (csr.data, jnp.asarray(csr.cols()), jnp.asarray(csr.indptr_arr())),
        shape=csr.shape)


def from_bcsr(mat, *, pattern_static: bool = True) -> SparseCSR:
    """BCSR -> SparseCSR."""
    _need()
    if mat.ndim != 2:
        raise ValueError("from_bcsr supports 2-D matrices")
    if pattern_static:
        return SparseCSR(np.asarray(mat.indptr), np.asarray(mat.indices),
                         mat.data, mat.shape)
    return SparseCSR(mat.indptr, mat.indices, mat.data, mat.shape,
                     pattern_static=False)
