"""Shared helpers for the autograd operator layer."""

from __future__ import annotations

import numpy as np
from jax.dtypes import float0

from ..types import SparseCOO, SparseCSR


def int_zero(x):
    """float0 cotangent for an integer-dtype primal."""
    import jax.numpy as jnp
    return np.zeros(jnp.shape(x), dtype=float0)


def sparse_cotangent(A, vals):
    """Build the cotangent pytree for a sparse container primal.

    Static-pattern containers have a single (data) leaf, so the cotangent is
    simply ``A.with_data(vals)``.  Dynamic-pattern containers additionally
    carry integer index leaves, which receive ``float0`` zeros.
    """
    ct = A.with_data(vals)
    if A.pattern_static:
        return ct
    if isinstance(A, SparseCOO):
        obj = object.__new__(SparseCOO)
        obj.data, obj.shape = vals, A.shape
        obj.pattern_static = False
        obj.row = int_zero(A.row)
        obj.col = int_zero(A.col)
        return obj
    obj = object.__new__(SparseCSR)
    obj.data, obj.shape = vals, A.shape
    obj.pattern_static = False
    obj.indptr = int_zero(A.indptr)
    obj.indices = int_zero(A.indices)
    return obj


def freeze_kwargs(kwargs: dict) -> tuple:
    """Hashable, order-independent representation of solver kwargs."""
    try:
        return tuple(sorted(kwargs.items()))
    except TypeError as e:
        raise TypeError(
            "solver kwargs must be hashable (use frozen settings dataclasses "
            f"rather than dicts/arrays): {e}") from e
