"""Segmented and per-row-indexed grouped matmuls (DGL/PyG-compatible).

TPU-native rebuild of the reference's
``/root/reference/torchsparsegradutils/indexed_matmul.py``:

* ``segment_mm(a, b, seglen_a)`` (:12-106) — splits ``a``'s rows into
  ``len(seglen_a)`` contiguous segments and multiplies segment ``i`` by
  ``b[i]``.  On TPU this is exactly ``jax.lax.ragged_dot`` — the grouped
  GEMM XLA maps onto the MXU (the reference falls back to nested tensors,
  :77-105).
* ``gather_mm(a, b, idx_b)`` (:109-218) — ``out[i] = a[i] @ b[idx_b[i]]``,
  implemented as sort-by-index → ragged_dot → scatter-back, mirroring the
  reference's per-matrix-id reshuffle (:204-218) but fully on-device and
  differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["segment_mm", "gather_mm"]


def _check_ab(a, b, op: str):
    if a.ndim != 2:
        raise ValueError(f"{op}: a must be 2-D (N, D1), got {a.ndim}-D")
    if b.ndim != 3:
        raise ValueError(f"{op}: b must be 3-D (R, D1, D2), got {b.ndim}-D")
    if a.shape[1] != b.shape[1]:
        raise ValueError(
            f"{op}: inner dims disagree, a is {a.shape} and b is {b.shape}")


def segment_mm(a, b, seglen_a):
    """Segmented matmul: rows of ``a`` in segment i are multiplied by
    ``b[i]``.

    Args:
      a: ``(N, D1)`` dense.
      b: ``(R, D1, D2)`` dense stack of matrices.
      seglen_a: ``(R,)`` integer segment lengths, ``sum == N`` (rows
        ``a[sum(seglen_a[:i]) : sum(seglen_a[:i+1])]`` use ``b[i]``).

    Returns:
      ``(N, D2)``.
    """
    a = jnp.asarray(a) if not isinstance(a, jax.core.Tracer) else a
    b = jnp.asarray(b) if not isinstance(b, jax.core.Tracer) else b
    _check_ab(a, b, "segment_mm")
    seglen_a = jnp.asarray(seglen_a)
    if seglen_a.ndim != 1 or seglen_a.shape[0] != b.shape[0]:
        raise ValueError(
            f"segment_mm: seglen_a must be 1-D with length {b.shape[0]}, "
            f"got shape {seglen_a.shape}")
    return jax.lax.ragged_dot(a, b, seglen_a.astype(jnp.int32))


def gather_mm(a, b, idx_b):
    """Indexed matmul: ``out[i] = a[i] @ b[idx_b[i]]``.

    Args:
      a: ``(N, D1)`` dense.
      b: ``(R, D1, D2)`` dense stack.
      idx_b: ``(N,)`` integer matrix index per row of ``a``.

    Returns:
      ``(N, D2)``.
    """
    a = jnp.asarray(a) if not isinstance(a, jax.core.Tracer) else a
    b = jnp.asarray(b) if not isinstance(b, jax.core.Tracer) else b
    _check_ab(a, b, "gather_mm")
    idx_b = jnp.asarray(idx_b)
    if idx_b.ndim != 1 or idx_b.shape[0] != a.shape[0]:
        raise ValueError(
            f"gather_mm: idx_b must be 1-D with length {a.shape[0]}, got "
            f"shape {idx_b.shape}")
    if not jnp.issubdtype(idx_b.dtype, jnp.integer):
        raise ValueError("gather_mm: idx_b must be an integer array")
    order = jnp.argsort(idx_b, stable=True)
    a_sorted = jnp.take(a, order, axis=0)
    counts = jnp.bincount(idx_b, length=b.shape[0]).astype(jnp.int32)
    out_sorted = jax.lax.ragged_dot(a_sorted, b, counts)
    return jnp.zeros_like(out_sorted).at[order].set(out_sorted)
