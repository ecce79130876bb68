"""Native (C++) host-side pattern-preprocessing kernels.

Compiled on demand with the system toolchain into a per-user cache and
loaded via ctypes (plain C ABI; no binding-library dependency).  Every
entry point has a numpy fallback, so the library works without a
compiler — the native path just makes plan building (lexsort, CSR
compression, chunk ranking) several times faster at nnz ≥ 1e6.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_SRC = os.path.join(os.path.dirname(__file__), "pattern_ops.cpp")


def _build_and_load() -> Optional[ctypes.CDLL]:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha1(f.read()).hexdigest()[:16]
        cache = os.path.join(tempfile.gettempdir(),
                             f"tsgu_tpu_native_{digest}")
        so_path = os.path.join(cache, "pattern_ops.so")
        if not os.path.exists(so_path):
            os.makedirs(cache, exist_ok=True)
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", tmp],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.lexsort_rowcol.restype = ctypes.c_int
        lib.lexsort_rowcol.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.compress_rows.restype = ctypes.c_int
        lib.compress_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.chunk_ranks.restype = ctypes.c_int64
        lib.chunk_ranks.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.tri_levels.restype = ctypes.c_int64
        lib.tri_levels.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.color_bipartite.restype = ctypes.c_int
        lib.color_bipartite.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.benes_route.restype = ctypes.c_int
        lib.benes_route.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        return lib
    except Exception:  # pragma: no cover - toolchain missing
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("TSGU_DISABLE_NATIVE") != "1":
            _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def lexsort_rowcol(rows: np.ndarray, cols: np.ndarray,
                   m: int) -> np.ndarray:
    """Permutation sorting entries by (row, col); radix-native or numpy."""
    lib = _lib()
    rows64 = np.ascontiguousarray(rows, np.int64)
    cols64 = np.ascontiguousarray(cols, np.int64)
    if lib is not None and len(rows64):
        perm = np.empty(len(rows64), np.int64)
        rc = lib.lexsort_rowcol(_ptr64(rows64), _ptr64(cols64),
                                len(rows64), int(m), _ptr64(perm))
        if rc == 0:
            return perm
    return np.lexsort((cols64, rows64))


def compress_rows(sorted_rows: np.ndarray, n: int,
                  dtype=np.int64) -> np.ndarray:
    """Sorted rows -> CSR indptr; native or numpy bincount+cumsum."""
    lib = _lib()
    rows64 = np.ascontiguousarray(sorted_rows, np.int64)
    if lib is not None:
        indptr = np.empty(n + 1, np.int64)
        if lib.compress_rows(_ptr64(rows64), len(rows64), int(n),
                             _ptr64(indptr)) == 0:
            return indptr.astype(dtype, copy=False)
    counts = np.bincount(rows64, minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr.astype(dtype, copy=False)


def tri_levels(rows: np.ndarray, cols: np.ndarray, n: int) -> np.ndarray:
    """Dependency level per row for a lower-triangular solve.

    ``level[i] = 1 + max(level[j])`` over stored strictly-lower entries
    ``(i, j)``; rows without strictly-lower entries get level 0.  Rows of
    one level are mutually independent — the level-scheduled solve
    processes them as one parallel stage.  Entries must be in canonical
    row-sorted order.  Native O(nnz) scan, or a vectorised numpy
    relaxation (one pass per level) as fallback.
    """
    rows64 = np.ascontiguousarray(rows, np.int64)
    cols64 = np.ascontiguousarray(cols, np.int64)
    lib = _lib()
    if lib is not None:
        lev = np.empty(n, np.int64)
        nl = lib.tri_levels(_ptr64(rows64), _ptr64(cols64), len(rows64),
                            int(n), _ptr64(lev))
        if nl > 0:
            return lev
    mask = cols64 < rows64
    r, c = rows64[mask], cols64[mask]
    lev = np.zeros(n, np.int64)
    for _ in range(n + 1):
        new = np.zeros(n, np.int64)
        np.maximum.at(new, r, lev[c] + 1)
        if (new == lev).all():
            break
        lev = new
    return lev


def color_bipartite(src: np.ndarray, dst: np.ndarray, R: int,
                    d: int) -> Optional[np.ndarray]:
    """Proper d-edge-coloring of a d-regular bipartite multigraph.

    ``src``/``dst``: per-edge endpoint indices in ``[0, R)``; ``d`` (a
    power of two) is the uniform degree.  Returns an int32 color per edge
    in ``[0, d)`` such that no two edges sharing a left or right endpoint
    get the same color (Kőnig), or None without the native library (the
    pure-python Euler walk is only viable for test-sized inputs).
    """
    if d <= 0 or (d & (d - 1)) != 0:
        return None
    src64 = np.ascontiguousarray(src, np.int64)
    dst64 = np.ascontiguousarray(dst, np.int64)
    ne = len(src64)
    lib = _lib()
    if lib is not None:
        colors = np.empty(ne, np.int32)
        if lib.color_bipartite(_ptr64(src64), _ptr64(dst64), ne, int(R),
                               int(d), _ptr32(colors)) == 0:
            return colors
    if ne > 600_000:
        return None
    return _color_bipartite_py(src64, dst64, int(R), int(d))


def _color_bipartite_py(src, dst, R, d):
    """Pure-python Euler-split coloring (test fallback)."""
    colors = np.zeros(len(src), np.int32)

    def split(edges, bit):
        if not len(edges) or bit < 0:
            return
        inc = [[] for _ in range(2 * R)]
        for t, e in enumerate(edges):
            inc[src[e]].append(t)
            inc[R + dst[e]].append(t)
        cursor = [0] * (2 * R)
        used = np.zeros(len(edges), bool)
        half = np.zeros(len(edges), bool)
        for t0 in range(len(edges)):
            if used[t0]:
                continue
            x = src[edges[t0]]
            t, side = t0, False
            while True:
                used[t] = True
                half[t] = side
                e = edges[t]
                x = R + dst[e] if x < R else src[e]
                side = not side
                lst = inc[x]
                c = cursor[x]
                while c < len(lst) and used[lst[c]]:
                    c += 1
                cursor[x] = c
                if c >= len(lst):
                    break
                t = lst[c]
        a, b = edges[~half], edges[half]
        colors[b] |= 1 << bit
        split(a, bit - 1)
        split(b, bit - 1)

    split(np.arange(len(src), dtype=np.int64), int(d).bit_length() - 2)
    return colors


def benes_route(perm: np.ndarray) -> Optional[np.ndarray]:
    """Beneš exchange-stage masks for ``out[i] = x[perm[i]]``.

    ``perm``: permutation of [0, n), n a power of two.  Returns
    ``(2*log2(n) - 1, n)`` uint8 masks (stage order: distances n/2 ...
    1 ... n/2; ``mask[s, i] == mask[s, i^d_s]``), or None without the
    native library (kernels/benes.py holds the python test fallback).
    """
    n = len(perm)
    if n < 2 or (n & (n - 1)) != 0:
        return None
    lib = _lib()
    if lib is None:
        return None
    perm64 = np.ascontiguousarray(perm, np.int64)
    k = int(n).bit_length() - 1
    masks = np.empty((2 * k - 1, n), np.uint8)
    if lib.benes_route(_ptr64(perm64), n,
                       masks.ctypes.data_as(
                           ctypes.POINTER(ctypes.c_uint8))) == 0:
        return masks
    return None


def chunk_ranks(rows_padded: np.ndarray, C: int, n: int,
                W_cap: int) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """(lr, seg_rows, W) per-chunk local row ranks; native or numpy."""
    nnz_pad = len(rows_padded)
    nchunks = nnz_pad // C
    lib = _lib()
    rows64 = np.ascontiguousarray(rows_padded, np.int64)
    if lib is not None:
        lr = np.empty(nnz_pad, np.int32)
        seg = np.empty(nchunks * W_cap, np.int32)
        w = lib.chunk_ranks(_ptr64(rows64), nnz_pad, int(C), int(n),
                            int(W_cap), _ptr32(lr), _ptr32(seg))
        if w > 0:
            return (lr.reshape(nchunks, C),
                    seg.reshape(nchunks, W_cap), int(w))
        if w == -1:
            return None
    rch = rows64.reshape(nchunks, C)
    new_row = np.concatenate([np.ones((nchunks, 1), bool),
                              rch[:, 1:] != rch[:, :-1]], axis=1)
    lr = (np.cumsum(new_row, axis=1) - 1).astype(np.int32)
    W = int(lr.max() + 1)
    if W > W_cap:
        return None
    seg = np.full((nchunks, W_cap), n, np.int32)
    np.put_along_axis(seg, lr, rch.astype(np.int32), axis=1)
    return lr, seg, W
