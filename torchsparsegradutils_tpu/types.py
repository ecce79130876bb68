"""Sparse array containers for the TPU-native sparse-autograd library.

Design (TPU-first, not a torch translation):

* ``SparseCOO`` / ``SparseCSR`` are registered pytrees whose ``data`` array is
  the (only) differentiable leaf.  The sparsity *pattern* (index arrays) is by
  default **static**: stored as content-hashed numpy arrays in the pytree aux
  data.  Under ``jax.jit`` the pattern is therefore a compile-time constant —
  exactly what enables Pallas scalar prefetch, host-side level scheduling for
  triangular solves, ``jnp.repeat`` with static repeats, and stable jit caches
  keyed on the pattern content.  Recompilation happens only when the pattern
  itself changes, which matches the intended workloads (a pattern is built
  once by an encoder / loaded once from disk and reused for many steps).

* A ``dynamic_pattern=True`` mode keeps indices as traced jax leaves for users
  who need one compiled program over many same-shape patterns.  Ops that
  require host-side pattern preprocessing (e.g. the level-scheduled
  triangular solve) require static patterns and say so.

* Batching is explicit: a container with ``shape=(B, n, m)`` carries batched
  ``data`` of shape ``(B, nnz)`` and (optionally batched) index arrays.  All
  batch elements share the same ``nnz`` (static shapes are non-negotiable on
  TPU); patterns may differ per element.  This replaces the reference's
  block-diagonalisation trick (``/root/reference/torchsparsegradutils/
  sparse_matmul.py:151-153``) with shapes XLA can tile.

Reference parity: containers play the role of ``torch.sparse_coo_tensor`` /
``torch.sparse_csr_tensor`` as used throughout
``/root/reference/torchsparsegradutils``.
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_pytree_node_class

__all__ = [
    "SparseCOO",
    "SparseCSC",
    "SparseCSR",
    "StaticArray",
    "is_sparse",
]

Array = Any  # jax.Array | np.ndarray


class StaticArray:
    """Hashable, immutable wrapper for numpy index arrays stored in pytree aux.

    Hash/equality are content based (cached digest), so two containers built
    from the same pattern hit the same jit cache entry; patterns with
    different content trigger (correct) recompilation.
    """

    __slots__ = ("arr", "_digest", "_hash")

    def __init__(self, arr: np.ndarray):
        arr = np.asarray(arr)
        arr.setflags(write=False)
        self.arr = arr
        h = hashlib.blake2b(digest_size=16)
        h.update(str((arr.shape, arr.dtype.str)).encode())
        h.update(arr.tobytes())
        self._digest = h.digest()
        self._hash = hash(self._digest)

    def __hash__(self) -> int:
        return self._hash

    def __eq__(self, other: object) -> bool:
        return isinstance(other, StaticArray) and self._digest == other._digest

    def __repr__(self) -> str:
        return f"StaticArray(shape={self.arr.shape}, dtype={self.arr.dtype})"

    @property
    def shape(self):
        return self.arr.shape

    @property
    def dtype(self):
        return self.arr.dtype


def _as_index_array(x, name: str, index_dtype=None) -> np.ndarray | jax.Array:
    if isinstance(x, StaticArray):
        x = x.arr
    if index_dtype is not None:
        if isinstance(x, np.ndarray):
            x = x.astype(index_dtype, copy=False)
        else:
            x = jnp.asarray(x, dtype=index_dtype)
    dt = np.dtype(x.dtype) if isinstance(x, np.ndarray) else x.dtype
    if not jnp.issubdtype(dt, jnp.integer):
        raise ValueError(f"{name} must have an integer dtype, got {dt}")
    return x


def _concrete_numpy(x, what: str) -> np.ndarray:
    """Pull an index array to host; error with a clear message if traced."""
    if isinstance(x, StaticArray):
        return x.arr
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, jax.core.Tracer):
        raise ValueError(
            f"{what} requires a concrete (non-traced) sparsity pattern. "
            "Build the container outside jit (pattern-static mode, the "
            "default) or precompute the required plan before jit-tracing."
        )
    return np.asarray(x)


def is_sparse(x) -> bool:
    return isinstance(x, (SparseCOO, SparseCSR))


_DEVICE_CACHE: dict = {}


def as_device_array(arr: np.ndarray):
    """Cached numpy -> jax array conversion for static plan tables.

    Capturing a numpy array in a jitted function inlines it as an HLO
    literal (bloating the program — the tunnelled remote compiler rejects
    >~100 MB bodies); capturing a jax array passes it by reference.  The
    cache holds a strong reference to the numpy array, so its id stays
    valid as a key."""
    if not isinstance(arr, np.ndarray):
        return arr
    key = id(arr)
    hit = _DEVICE_CACHE.get(key)
    if hit is not None and hit[0] is arr:
        return hit[1]
    # force an eager (non-traced) conversion even when called inside jit,
    # otherwise the cache would capture and leak a tracer
    with jax.ensure_compile_time_eval():
        dev = jnp.asarray(arr)
    _DEVICE_CACHE[key] = (arr, dev)
    return dev


class _SparseBase:
    """Shared behaviour of SparseCOO / SparseCSR."""

    shape: Tuple[int, ...]
    data: Array

    # ------------------------------------------------------------------ meta
    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> int:
        return int(self.data.shape[-1])

    @property
    def n_batch(self) -> int:
        return self.ndim - 2

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.shape[:-2]

    @property
    def mat_shape(self) -> Tuple[int, int]:
        return self.shape[-2:]

    def __repr__(self) -> str:
        mode = "static" if self.pattern_static else "dynamic"
        return (
            f"{type(self).__name__}(shape={self.shape}, nnz={self.nnz}, "
            f"dtype={self.dtype}, pattern={mode})"
        )

    def astype(self, dtype):
        return self.with_data(jnp.asarray(self.data, dtype=dtype))


def _maybe_static(x, static: bool):
    """Wrap as StaticArray (host numpy) or jnp array according to mode."""
    if static:
        if isinstance(x, StaticArray):
            return x
        return StaticArray(np.asarray(x))
    if isinstance(x, StaticArray):
        return jnp.asarray(x.arr)
    if isinstance(x, np.ndarray):
        return jnp.asarray(x)
    return x


def _unwrap(x) -> Array:
    """Return a jnp-compatible array view of a (possibly static) index array."""
    return x.arr if isinstance(x, StaticArray) else x


@register_pytree_node_class
class SparseCOO(_SparseBase):
    """Coordinate-format sparse matrix (optionally batched).

    Attributes:
      row, col: int arrays of shape ``(*batch?, nnz)`` — batched patterns may
        either share one ``(nnz,)`` pattern or carry per-element
        ``(B, nnz)`` indices.
      data: ``(*batch, nnz)`` values (the differentiable leaf).
      shape: full static shape ``(*batch, n, m)``.
    """

    def __init__(self, row, col, data, shape, *, pattern_static: bool = True,
                 index_dtype=None, _skip_checks: bool = False):
        shape = tuple(int(s) for s in shape)
        if len(shape) < 2:
            raise ValueError(f"shape must have >= 2 dims, got {shape}")
        row = _as_index_array(row, "row", index_dtype)
        col = _as_index_array(col, "col", index_dtype)
        self.row = _maybe_static(row, pattern_static)
        self.col = _maybe_static(col, pattern_static)
        self.data = data if isinstance(data, jax.core.Tracer) else jnp.asarray(data)
        self.shape = shape
        self.pattern_static = bool(pattern_static)
        if not _skip_checks:
            nnz = self.data.shape[-1]
            for name, idx in (("row", self.row), ("col", self.col)):
                ish = _unwrap(idx).shape
                if ish[-1] != nnz:
                    raise ValueError(
                        f"{name} has {ish[-1]} entries but data has nnz={nnz}")
                if len(ish) not in (1, len(shape) - 1):
                    raise ValueError(
                        f"{name} must be 1-D or have one leading batch dim "
                        f"per batch axis; got shape {ish} for shape {shape}")
            if tuple(self.data.shape[:-1]) != shape[:-2]:
                raise ValueError(
                    f"data batch dims {self.data.shape[:-1]} do not match "
                    f"shape batch dims {shape[:-2]}")

    # --------------------------------------------------------------- pytree
    def tree_flatten(self):
        if self.pattern_static:
            return (self.data,), (self.row, self.col, self.shape, True)
        return (self.data, self.row, self.col), (None, None, self.shape, False)

    @classmethod
    def tree_unflatten(cls, aux, children):
        row, col, shape, static = aux
        obj = object.__new__(cls)
        if static:
            (obj.data,) = children
            obj.row, obj.col = row, col
        else:
            obj.data, obj.row, obj.col = children
        obj.shape = shape
        obj.pattern_static = static
        return obj

    # ------------------------------------------------------------ accessors
    @property
    def layout(self) -> str:
        return "coo"

    def row_sa(self) -> Optional["StaticArray"]:
        """Content-hashed row indices, or None for traced patterns."""
        if isinstance(self.row, StaticArray):
            return self.row
        if isinstance(self.row, jax.core.Tracer):
            return None
        sa = getattr(self, "_row_sa_cache", None)
        if sa is None:
            sa = StaticArray(np.asarray(self.row))
            object.__setattr__(self, "_row_sa_cache", sa)
        return sa

    def col_sa(self) -> Optional["StaticArray"]:
        if isinstance(self.col, StaticArray):
            return self.col
        if isinstance(self.col, jax.core.Tracer):
            return None
        sa = getattr(self, "_col_sa_cache", None)
        if sa is None:
            sa = StaticArray(np.asarray(self.col))
            object.__setattr__(self, "_col_sa_cache", sa)
        return sa

    def rows(self) -> Array:
        """Row indices as a jax-usable array, shape ``(*patt_batch?, nnz)``."""
        return _unwrap(self.row)

    def cols(self) -> Array:
        return _unwrap(self.col)

    def rows_np(self, what: str = "this operation") -> np.ndarray:
        return _concrete_numpy(self.row, what)

    def cols_np(self, what: str = "this operation") -> np.ndarray:
        return _concrete_numpy(self.col, what)

    def indices_batched(self) -> bool:
        return _unwrap(self.row).ndim > 1

    # ------------------------------------------------------------- builders
    def with_data(self, data) -> "SparseCOO":
        obj = object.__new__(SparseCOO)
        obj.row, obj.col, obj.shape = self.row, self.col, self.shape
        obj.pattern_static = self.pattern_static
        obj.data = data
        return obj

    @classmethod
    def fromdense(cls, x, *, nnz: Optional[int] = None, index_dtype=jnp.int32,
                  pattern_static: bool = True) -> "SparseCOO":
        """Build from a dense array (host-side; pattern from nonzeros).

        With ``nnz`` given, pads (with zero-valued entries at position (0,0))
        or errors if actual nnz exceeds it.  Batched input requires each
        element to have the same nnz (or pass explicit ``nnz``).
        """
        x = np.asarray(x)
        if x.ndim < 2:
            raise ValueError("fromdense requires ndim >= 2")
        if x.ndim == 2:
            r, c = np.nonzero(x)
            k = len(r)
            target = nnz if nnz is not None else k
            if k > target:
                raise ValueError(f"array has {k} nonzeros > nnz={target}")
            pad = target - k
            rr = np.concatenate([r, np.zeros(pad, r.dtype)])
            cc = np.concatenate([c, np.zeros(pad, c.dtype)])
            vv = np.concatenate([x[r, c], np.zeros(pad, x.dtype)])
            return cls(rr.astype(np.dtype(index_dtype)),
                       cc.astype(np.dtype(index_dtype)), vv, x.shape,
                       pattern_static=pattern_static)
        # batched: flatten batch dims, recurse, stack
        bshape = x.shape[:-2]
        flat = x.reshape((-1,) + x.shape[-2:])
        if nnz is None:
            counts = [int((m != 0).sum()) for m in flat]
            if len(set(counts)) != 1:
                raise ValueError(
                    f"batched fromdense requires equal nnz per element "
                    f"(got {sorted(set(counts))}); pass nnz= to pad")
            nnz = counts[0]
        parts = [cls.fromdense(m, nnz=nnz, index_dtype=index_dtype) for m in flat]
        row = np.stack([p.rows_np() for p in parts]).reshape(bshape + (nnz,))
        col = np.stack([p.cols_np() for p in parts]).reshape(bshape + (nnz,))
        data = jnp.stack([p.data for p in parts]).reshape(bshape + (nnz,))
        # collapse batch dim of indices if every element shares the pattern
        r2 = row.reshape(-1, nnz)
        c2 = col.reshape(-1, nnz)
        if (r2 == r2[0]).all() and (c2 == c2[0]).all():
            row, col = r2[0], c2[0]
        else:
            if len(bshape) != 1:
                raise ValueError(
                    "batched fromdense with per-element patterns supports "
                    "exactly one batch dim")
        return cls(row, col, data, x.shape, pattern_static=pattern_static)

    # ------------------------------------------------------------ transform
    def todense(self) -> jax.Array:
        r, c = jnp.asarray(self.rows()), jnp.asarray(self.cols())
        n, m = self.mat_shape
        if self.n_batch == 0:
            out = jnp.zeros((n, m), self.dtype)
            return out.at[r, c].add(self.data)
        bshape = self.batch_shape
        data = self.data.reshape((-1, self.nnz))
        if r.ndim == 1:
            fn = lambda d: jnp.zeros((n, m), self.dtype).at[r, c].add(d)
            out = jax.vmap(fn)(data)
        else:
            r2 = r.reshape(-1, self.nnz)
            c2 = c.reshape(-1, self.nnz)
            fn = lambda d, rr, cc: jnp.zeros((n, m), self.dtype).at[rr, cc].add(d)
            out = jax.vmap(fn)(data, r2, c2)
        return out.reshape(bshape + (n, m))

    def transpose(self) -> "SparseCOO":
        shape = self.batch_shape + (self.shape[-1], self.shape[-2])
        return SparseCOO(self.col, self.row, self.data, shape,
                         pattern_static=self.pattern_static, _skip_checks=True)

    @property
    def T(self) -> "SparseCOO":
        return self.transpose()

    def sort_indices(self) -> "SparseCOO":
        """Return a row-major (row, then col) lexicographically sorted copy."""
        if self.pattern_static or not isinstance(self.rows(), jax.core.Tracer):
            r = self.rows_np("sort_indices")
            c = self.cols_np("sort_indices")
            if r.ndim == 1:
                perm = np.lexsort((c, r))
                data = (self.data[..., perm]
                        if self.n_batch else self.data[perm])
                return SparseCOO(r[perm], c[perm], data, self.shape,
                                 pattern_static=self.pattern_static)
            perms = np.stack([np.lexsort((cc, rr)) for rr, cc in
                              zip(r.reshape(-1, self.nnz),
                                  c.reshape(-1, self.nnz))])
            perms = perms.reshape(r.shape)
            data = jnp.take_along_axis(self.data, jnp.asarray(perms), axis=-1)
            return SparseCOO(np.take_along_axis(r, perms, -1),
                             np.take_along_axis(c, perms, -1), data,
                             self.shape, pattern_static=self.pattern_static)
        # traced dynamic pattern
        r, c = self.rows(), self.cols()
        key = r.astype(jnp.int64) if jax.config.jax_enable_x64 else r
        perm = jnp.lexsort((c, r))
        take = lambda a: jnp.take(a, perm, axis=-1)
        rr = take(r) if r.ndim == 1 else jnp.take_along_axis(r, perm, -1)
        cc = take(c) if c.ndim == 1 else jnp.take_along_axis(c, perm, -1)
        del key
        data = jnp.take(self.data, perm, axis=-1) if self.data.ndim == 1 else \
            jnp.take_along_axis(self.data, jnp.broadcast_to(perm, self.data.shape), -1)
        return SparseCOO(rr, cc, data, self.shape, pattern_static=False,
                         _skip_checks=True)

    def tocsr(self) -> "SparseCSR":
        from .utils import structure  # local import to avoid cycle
        return structure.coo_to_csr(self)

    def tocoo(self) -> "SparseCOO":
        return self

    def index_dtype(self):
        return _unwrap(self.row).dtype


@register_pytree_node_class
class SparseCSR(_SparseBase):
    """Compressed-sparse-row matrix (optionally batched).

    Attributes:
      indptr: ``(*patt_batch?, n+1)`` row pointers.
      indices: ``(*patt_batch?, nnz)`` column indices.
      data: ``(*batch, nnz)`` values (differentiable leaf).
      shape: ``(*batch, n, m)``.
    """

    def __init__(self, indptr, indices, data, shape, *,
                 pattern_static: bool = True, index_dtype=None,
                 _skip_checks: bool = False):
        shape = tuple(int(s) for s in shape)
        if len(shape) < 2:
            raise ValueError(f"shape must have >= 2 dims, got {shape}")
        indptr = _as_index_array(indptr, "indptr", index_dtype)
        indices = _as_index_array(indices, "indices", index_dtype)
        self.indptr = _maybe_static(indptr, pattern_static)
        self.indices = _maybe_static(indices, pattern_static)
        self.data = data if isinstance(data, jax.core.Tracer) else jnp.asarray(data)
        self.shape = shape
        self.pattern_static = bool(pattern_static)
        if not _skip_checks:
            n = shape[-2]
            ip = _unwrap(self.indptr)
            ix = _unwrap(self.indices)
            if ip.shape[-1] != n + 1:
                raise ValueError(
                    f"indptr last dim {ip.shape[-1]} != n+1 = {n + 1}")
            if ix.shape[-1] != self.data.shape[-1]:
                raise ValueError(
                    f"indices nnz {ix.shape[-1]} != data nnz "
                    f"{self.data.shape[-1]}")
            if tuple(self.data.shape[:-1]) != shape[:-2]:
                raise ValueError(
                    f"data batch dims {self.data.shape[:-1]} do not match "
                    f"shape batch dims {shape[:-2]}")

    # --------------------------------------------------------------- pytree
    def tree_flatten(self):
        if self.pattern_static:
            return (self.data,), (self.indptr, self.indices, self.shape, True)
        return ((self.data, self.indptr, self.indices),
                (None, None, self.shape, False))

    @classmethod
    def tree_unflatten(cls, aux, children):
        indptr, indices, shape, static = aux
        obj = object.__new__(cls)
        if static:
            (obj.data,) = children
            obj.indptr, obj.indices = indptr, indices
        else:
            obj.data, obj.indptr, obj.indices = children
        obj.shape = shape
        obj.pattern_static = static
        return obj

    # ------------------------------------------------------------ accessors
    @property
    def layout(self) -> str:
        return "csr"

    def row_sa(self) -> Optional["StaticArray"]:
        """Content-hashed decompressed row indices (cached), or None."""
        if isinstance(self.indptr, jax.core.Tracer):
            return None
        sa = getattr(self, "_row_sa_cache", None)
        if sa is None:
            sa = StaticArray(self.rows_np())
            object.__setattr__(self, "_row_sa_cache", sa)
        return sa

    def col_sa(self) -> Optional["StaticArray"]:
        if isinstance(self.indices, StaticArray):
            return self.indices
        if isinstance(self.indices, jax.core.Tracer):
            return None
        sa = getattr(self, "_col_sa_cache", None)
        if sa is None:
            sa = StaticArray(np.asarray(self.indices))
            object.__setattr__(self, "_col_sa_cache", sa)
        return sa

    def indptr_arr(self) -> Array:
        return _unwrap(self.indptr)

    def cols(self) -> Array:
        return _unwrap(self.indices)

    def indptr_np(self, what: str = "this operation") -> np.ndarray:
        return _concrete_numpy(self.indptr, what)

    def cols_np(self, what: str = "this operation") -> np.ndarray:
        return _concrete_numpy(self.indices, what)

    def indices_batched(self) -> bool:
        return _unwrap(self.indptr).ndim > 1

    def rows(self) -> Array:
        """Decompressed row index per nonzero (jnp.repeat, static-friendly).

        TPU-native equivalent of the reference's crow decompression
        (``/root/reference/torchsparsegradutils/utils/utils.py:413-470``).
        """
        ip = self.indptr_arr()
        n = self.shape[-2]

        def expand(p):
            counts = jnp.diff(jnp.asarray(p))
            return jnp.repeat(jnp.arange(n, dtype=jnp.asarray(p).dtype),
                              counts, total_repeat_length=self.nnz)

        if ip.ndim == 1:
            if isinstance(ip, np.ndarray):  # static fast path on host
                counts = np.diff(ip)
                return np.repeat(np.arange(n, dtype=ip.dtype), counts)
            return expand(ip)
        if isinstance(ip, np.ndarray):
            return np.stack([np.repeat(np.arange(n, dtype=ip.dtype), np.diff(p))
                             for p in ip.reshape(-1, ip.shape[-1])]
                            ).reshape(ip.shape[:-1] + (self.nnz,))
        return jax.vmap(expand)(ip.reshape(-1, ip.shape[-1])).reshape(
            ip.shape[:-1] + (self.nnz,))

    def rows_np(self, what: str = "this operation") -> np.ndarray:
        ip = self.indptr_np(what)
        n = self.shape[-2]
        if ip.ndim == 1:
            return np.repeat(np.arange(n, dtype=ip.dtype), np.diff(ip))
        return np.stack([np.repeat(np.arange(n, dtype=ip.dtype), np.diff(p))
                         for p in ip.reshape(-1, ip.shape[-1])]
                        ).reshape(ip.shape[:-1] + (self.nnz,))

    # ------------------------------------------------------------- builders
    def with_data(self, data) -> "SparseCSR":
        obj = object.__new__(SparseCSR)
        obj.indptr, obj.indices, obj.shape = self.indptr, self.indices, self.shape
        obj.pattern_static = self.pattern_static
        obj.data = data
        return obj

    @classmethod
    def fromdense(cls, x, *, nnz: Optional[int] = None, index_dtype=jnp.int32,
                  pattern_static: bool = True) -> "SparseCSR":
        coo = SparseCOO.fromdense(x, nnz=nnz, index_dtype=index_dtype,
                                  pattern_static=pattern_static)
        return coo.tocsr()

    # ------------------------------------------------------------ transform
    def todense(self) -> jax.Array:
        return self.tocoo().todense()

    def tocoo(self) -> "SparseCOO":
        return SparseCOO(self.rows() if not self.pattern_static
                         else self.rows_np(), self.indices, self.data,
                         self.shape, pattern_static=self.pattern_static,
                         _skip_checks=True)

    def tocsr(self) -> "SparseCSR":
        return self

    def transpose(self) -> "SparseCSR":
        """CSC-as-CSR transpose (host-side pattern work; static patterns)."""
        from .utils import structure
        return structure.csr_transpose(self)

    @property
    def T(self) -> "SparseCSR":
        return self.transpose()

    def index_dtype(self):
        return _unwrap(self.indices).dtype


class SparseCSC:
    """Compressed-sparse-column matrix (2-D).

    Parity with the reference's CSC acceptance in ``sparse_logsumexp``
    (sparse_logsumexp.py:76-102 reads CSC index arrays directly).  Stored
    internally as the CSR of the transpose — on TPU every op runs on
    row-major streams, so a CSC matrix *is* its transpose's CSR plus a
    dimension swap at the API boundary.

    Attributes:
      indptr: ``(m+1,)`` column pointers.
      indices: ``(nnz,)`` row indices (sorted within each column).
      data: ``(nnz,)`` values in column-major order.
      shape: ``(n, m)``.
    """

    def __init__(self, indptr, indices, data, shape, *,
                 pattern_static: bool = True, index_dtype=None):
        shape = tuple(int(s) for s in shape)
        if len(shape) != 2:
            raise ValueError("SparseCSC supports 2-D matrices only")
        self._t = SparseCSR(indptr, indices, data, (shape[1], shape[0]),
                            pattern_static=pattern_static,
                            index_dtype=index_dtype)
        self.shape = shape

    @property
    def data(self):
        return self._t.data

    @property
    def dtype(self):
        return self._t.dtype

    @property
    def ndim(self) -> int:
        return 2

    @property
    def nnz(self) -> int:
        return self._t.nnz

    @property
    def layout(self) -> str:
        return "csc"

    def transpose_csr(self) -> "SparseCSR":
        """The transpose as a CSR container (zero-copy view)."""
        return self._t

    def with_data(self, data) -> "SparseCSC":
        obj = object.__new__(SparseCSC)
        obj._t = self._t.with_data(data)
        obj.shape = self.shape
        return obj

    def todense(self):
        return self._t.todense().T
