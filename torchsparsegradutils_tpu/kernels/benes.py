"""Beneš-network application of static value permutations.

An arbitrary static permutation of ``nnz`` scalars — the CSR→CSC value
reorder behind column-direction ops, the ELL value-table fill of the
triangular solve — costs ~21 ms at 3M f32 values as an XLA flat gather
on the v5e (one HBM transaction per element; measured floor, see
``kernels/shuffle.py``).  A Beneš (butterfly + inverse butterfly)
network realises the SAME permutation as ``2·log2(N) − 1`` oblivious
exchange stages:

    stage with distance d:   y[i] = mask[i] ? y[i ^ d] : y[i]

Every stage is a lane/sublane-aligned block swap (``reshape`` + size-2
axis ``flip``) plus an elementwise ``where`` — pure streaming ops that
XLA fuses and runs at HBM rate, with no scattered access at all.  At
N = 4M that is 43 stages × ~3 passes over 16 MB ≈ **~2 ms vs the 21 ms
gather floor** (the round-5 probe validates the constant).

The per-stage swap masks are routed host-side from the static
permutation by the classic looping algorithm (Beneš 1964; Waksman
1968): 2-color each level's constraint cycles, recurse on the halves —
O(N log N), in C++ (``native.benes_route``) with a numpy/python
fallback for test sizes.  Masks are content-addressed by the
permutation's StaticArray hash and cached.

The reference has no analogue (torch ``index_select`` gathers at full
rate on GPU HBM); this exists because TPU vector memory has no
scattered access — the Beneš factorisation turns "scatter" into
"stream", which is the only thing the platform does at full speed.

Scope notes:
* masks cost ``(2k−1) · N`` bytes HBM (172 MB at N=4M) — a plan is
  only built when the caller opts in (hot static patterns, reused
  across many steps); one-shot permutations keep the flat gather.
* the VJP applies the SAME network in reverse stage order (a Beneš
  network run backwards applies the inverse permutation) — no second
  routing pass, no scatter-add.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import StaticArray, as_device_array

LANE = 128


def _stage_distances(n: int):
    """Distances of the 2k-1 stages, input side outermost:
    n/2, n/4, ..., 2, 1, 2, ..., n/4, n/2."""
    k = n.bit_length() - 1
    down = [n >> (t + 1) for t in range(k)]          # n/2 ... 1
    return down + down[-2::-1]


def route_masks(perm: np.ndarray) -> Optional[np.ndarray]:
    """Per-stage swap masks realising ``out[i] = x[perm[i]]``.

    ``perm``: permutation of [0, n), n a power of two >= 2.  Returns
    uint8 masks of shape (2k-1, n) with ``mask[s, i] == mask[s, i^d_s]``
    (pairs swap together), or None when no router is available at this
    size (native library missing; the python fallback handles test
    sizes only).
    """
    from .. import native

    n = len(perm)
    assert n >= 2 and (n & (n - 1)) == 0, "benes: size must be a power of 2"
    masks = native.benes_route(perm)
    if masks is not None:
        return masks
    if n > (1 << 16):
        return None
    return _route_py(np.asarray(perm, np.int64))


def _route_py(perm: np.ndarray) -> np.ndarray:
    """Pure-python looping-algorithm router (test fallback)."""
    n = len(perm)
    k = n.bit_length() - 1
    masks = np.zeros((2 * k - 1, n), np.uint8)

    def route(pi, lo, s, s_in, s_out):
        # pi: local perm on [0, s): out j <- in pi[j]; block offset lo
        if s == 2:
            masks[s_in, lo:lo + 2] = 1 if pi[0] == 1 else 0
            return
        m = s // 2
        inv = np.empty(s, np.int64)
        inv[pi] = np.arange(s)
        h = np.full(s, -1, np.int8)     # half per OUTPUT position
        for o0 in range(s):
            if h[o0] >= 0:
                continue
            o, hv = o0, 0
            while h[o] < 0:
                h[o] = hv
                o2 = inv[pi[o] ^ m]     # in-pair partner element
                h[o2] = 1 - hv
                o = o2 ^ m              # its out-pair partner
                hv = 1 - h[o2]
        # input stage: swap pair (i, i+m) iff element at input i goes high
        for i in range(m):
            sw = h[inv[i]]
            masks[s_in, lo + i] = sw
            masks[s_in, lo + i + m] = sw
        # output stage: swap pair (o, o+m) iff element exiting at o<m
        # comes from the high half
        for o in range(m):
            sw = h[o]
            masks[s_out, lo + o] = sw
            masks[s_out, lo + o + m] = sw
        sub = [np.empty(m, np.int64), np.empty(m, np.int64)]
        for o in range(s):
            sub[h[o]][o % m] = pi[o] % m
        route(sub[0], lo, m, s_in + 1, s_out - 1)
        route(sub[1], lo + m, m, s_in + 1, s_out - 1)

    route(np.asarray(perm, np.int64), 0, n, 0, 2 * k - 2)
    return masks


def _row_xor(y: jax.Array, D: int) -> jax.Array:
    """y'[r, :] = y[r ^ D, :] — XOR-partner rows via two rolls + a
    static bit select.  Rolls and iota-bit selects are uniform streaming
    ops with full-size trailing dims; the naive ``reshape(..., 2, D)``
    + ``flip`` formulation tile-pads the tiny trailing dims up to 64x
    (measured: 1 GB HLO temps per stage at 16 MB payloads -> OOM)."""
    lg = D.bit_length() - 1
    r = jax.lax.broadcasted_iota(jnp.int32, (y.shape[0], 1), 0)
    bit = (r >> lg) & 1
    return jnp.where(bit == 0, jnp.roll(y, -D, 0), jnp.roll(y, D, 0))


def _apply(masks_dev, n_pad: int, x: jax.Array, reverse: bool) -> jax.Array:
    """Run the exchange stages (reverse order = inverse permutation:
    each stage is an involution, so the reversed network inverts the
    net).  ``masks_dev``: list of per-stage on-device uint8 masks, row
    stages as (R, LANE), middle (lane-bit) stages pre-transposed to
    (LANE, R) — the data is transposed ONCE into that layout, every
    middle stage runs as a row exchange there, and transposed back, so
    no stage ever exchanges along the lane axis."""
    dists = _stage_distances(n_pad)
    order = range(len(dists) - 1, -1, -1) if reverse else range(len(dists))
    flat = x.ravel()
    if flat.shape[0] != n_pad:
        flat = jnp.pad(flat, (0, n_pad - flat.shape[0]))
    y = flat.reshape(-1, LANE)
    transposed = False
    for s in order:
        d = dists[s]
        mid = d < LANE
        if mid != transposed:
            y = y.T
            transposed = mid
        m = masks_dev[s]
        D = d if mid else d // LANE
        y = jnp.where(m != 0, _row_xor(y, D), y)
    if transposed:
        y = y.T
    return y.reshape(-1)


def apply_stages(masks_dev, n_pad: int, x: jax.Array) -> jax.Array:
    return _apply(masks_dev, n_pad, x, reverse=False)


def apply_stages_inverse(masks_dev, n_pad: int, x: jax.Array) -> jax.Array:
    return _apply(masks_dev, n_pad, x, reverse=True)


# --------------------------------------------------------------------------
# cached plans over StaticArray permutations
# --------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _plan(perm_sa: StaticArray):
    """(n_pad, per-stage mask StaticArrays) for a StaticArray
    permutation, or None when routing is unavailable.  Row-stage masks
    are laid out (R, LANE); middle (lane-bit) stage masks are
    pre-transposed to (LANE, R) host-side so the device applies every
    stage as a row exchange (see :func:`_apply`)."""
    perm = perm_sa.arr
    n = len(perm)
    if n < 2:
        return None
    n_pad = 1 << max(int(n - 1).bit_length(), 7)   # >= 128 for the layout
    if n_pad != n:
        perm = np.concatenate(
            [np.asarray(perm, np.int64),
             np.arange(n, n_pad, dtype=np.int64)])
    masks = route_masks(perm)
    if masks is None:
        return None
    staged = []
    for s, d in enumerate(_stage_distances(n_pad)):
        m = masks[s].reshape(-1, LANE)
        if d < LANE:
            m = m.T
        staged.append(StaticArray(np.ascontiguousarray(m)))
    return n_pad, tuple(staged)


def benes_permute(perm_sa: StaticArray, x: jax.Array,
                  inverse: bool = False) -> jax.Array:
    """``out[i] = x[perm[i]]`` (or the inverse permutation with
    ``inverse=True``) through the exchange network.  Raises ValueError
    when no plan can be routed — callers gate on :func:`has_plan`."""
    planned = _plan(perm_sa)
    if planned is None:
        raise ValueError("benes_permute: no routing available")
    n_pad, staged = planned
    n = x.shape[0]
    md = [as_device_array(m.arr) for m in staged]
    out = (apply_stages_inverse if inverse else apply_stages)(
        md, n_pad, x)
    return out[:n]


def has_plan(perm_sa: StaticArray) -> bool:
    return _plan(perm_sa) is not None


# --------------------------------------------------------------------------
# injective static gathers (ELL-style table fills) on the same network
# --------------------------------------------------------------------------
#
# ``out[t] = x[sel[t]]`` where ``sel`` hits each source index AT MOST once
# (sentinel = n_in reads zero) is a permutation in disguise: pad the
# input with zeros to a power of two, route sentinel/tail slots to unused
# (zero) positions, and the whole table fill becomes one Beneš pass.  The
# VJP is a single inverse pass (d_x[j] = ct[pos(j)]) — no scatter.

@lru_cache(maxsize=64)
def _gather_plan(sel_sa: StaticArray, n_in: int):
    """(n_pad, staged masks, T) for an injective sel (sentinel = n_in),
    or None when out of scope / unroutable."""
    sel = sel_sa.arr.reshape(-1).astype(np.int64)
    T = sel.size
    n_pad = 1 << max(int(max(T, n_in + 1) - 1).bit_length(), 7)
    perm = np.full(n_pad, -1, np.int64)
    is_real = sel < n_in
    if is_real.sum() and np.bincount(sel[is_real]).max() > 1:
        return None                      # not injective: out of scope
    perm[:T][is_real] = sel[is_real]
    # unused sources, zeros-first so sentinel/tail slots read zero pad
    used = np.zeros(n_pad, bool)
    used[sel[is_real]] = True
    free = np.nonzero(~used)[0]
    free_zero = free[free >= n_in]       # positions reading the zero pad
    free_data = free[free < n_in]        # unreferenced data entries
    fill = np.concatenate([free_zero, free_data])
    perm[perm < 0] = fill[:int((perm < 0).sum())]
    masks = route_masks(perm)
    if masks is None:
        return None
    staged = []
    for s, d in enumerate(_stage_distances(n_pad)):
        m = masks[s].reshape(-1, LANE)
        if d < LANE:
            m = m.T
        staged.append(StaticArray(np.ascontiguousarray(m)))
    return n_pad, tuple(staged), T


def has_gather_plan(sel_sa: StaticArray, n_in: int) -> bool:
    return _gather_plan(sel_sa, n_in) is not None


def benes_gather(sel_sa: StaticArray, n_in: int, x: jax.Array):
    """``out.reshape(-1)[t] = x_ext[sel.reshape(-1)[t]]`` (``x_ext`` = x
    padded with zeros; sentinel ``n_in`` reads zero) via the exchange
    network; returns the table with ``sel``'s shape.  Raises ValueError
    when no plan routes — gate with :func:`has_gather_plan`."""
    planned = _gather_plan(sel_sa, n_in)
    if planned is None:
        raise ValueError("benes_gather: no routing available")
    n_pad, staged, T = planned
    md = [as_device_array(m.arr) for m in staged]
    out = apply_stages(md, n_pad, x)
    return out[:T].reshape(sel_sa.arr.shape)


def benes_gather_t(sel_sa: StaticArray, n_in: int, ct: jax.Array):
    """Transpose of :func:`benes_gather`: scatter the table cotangent
    back to the source positions (``d_x[j] = ct[pos(j)]``) as one
    inverse network pass."""
    planned = _gather_plan(sel_sa, n_in)
    if planned is None:
        raise ValueError("benes_gather_t: no routing available")
    n_pad, staged, T = planned
    md = [as_device_array(m.arr) for m in staged]
    out = apply_stages_inverse(md, n_pad, ct.reshape(-1))
    return out[:n_in]
