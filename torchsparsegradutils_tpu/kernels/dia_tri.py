"""Banded (DIA) sparse triangular solve: one sequential Pallas kernel.

The reference runs cuSPARSE's sequential ``torch.triangular_solve``
(sparse_solve.py:182-184).  The repo's generic path (a ``lax.scan`` of
block steps, ops/triangular_solve.py) is latency-bound: every step is a
separate device dispatch (~0.1 ms x ~1000 blocks → ~100 ms at cfd2
scale).  For banded operators — the triangular factors this library
actually meets: stencil/encoder Cholesky-style factors — this kernel
runs the *whole* back-substitution inside a single Pallas program:

* the last ``span`` solved rows of x live in a VMEM rolling window;
* each sequential grid step computes one row block:
  ``xb = Dinv_b @ (B_b - Σ_k v[:, k] ⊙ xwin[shift_k])`` — the off-
  diagonal application is the DIA shifted-stream pattern (kernels/dia.py)
  against the window; the diagonal block applies a precomputed inverse on
  the MXU;
* the grid runs sequentially on one core, so the carried window is plain
  scratch state — no host round trips, no per-step dispatch.

Upper-triangular and transpose solves reduce to this lower core without
any value permutation:

* ``Aᵀ`` is DIA with negated offsets over a column-shifted value grid
  (``dia._transpose_grid``) — cheap static shifts;
* an upper system turns lower under full index reversal, which at the
  grid level is ``grid[::-1, ::-1]`` and ``B[::-1]`` — cheap flips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import as_device_array

LANE = 128
SPAN_CAP = 8192      # max bandwidth the rolling window supports
NB = 256             # row-block size


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _build_diag_inv(offsets, gridv, n, nblk, nb, unit: bool, dtype):
    """(nblk, nb, nb) inverses of the lower-triangular diagonal blocks."""
    n_pad = nblk * nb
    gp = jnp.pad(gridv, ((0, n_pad - n), (0, 0)))
    ri = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    D = jnp.zeros((nblk, nb, nb), dtype)
    for k, off in enumerate(offsets):
        off = int(off)
        if off > 0 or -off >= nb or (unit and off == 0):
            continue
        col = gp[:, k].reshape(nblk, nb)            # value at (r, r+off)
        D = D + jnp.where(ci == ri + off, col[:, :, None], 0.0)
    eye = jnp.eye(nb, dtype=dtype)
    if unit:
        D = D + eye
    else:
        # unit diagonal for padded rows of the last block
        blk_base = jnp.arange(nblk, dtype=jnp.int32)[:, None, None] * nb
        D = D + jnp.where((ri == ci)[None] & (ri[None] + blk_base >= n),
                          1.0, 0.0)
    return jax.scipy.linalg.solve_triangular(
        D, jnp.broadcast_to(eye, (nblk, nb, nb)), lower=True)


def tri_dia_core(offsets: np.ndarray, gridv, B, *,
                 unit: bool) -> Optional[jax.Array]:
    """Solve lower-triangular ``A x = B``; A given as an (n, K) diagonal
    value grid over ``offsets``.  Entries above the diagonal (positive
    offsets) are ignored, matching dense triangular-solve semantics.
    Returns None when the band exceeds the window cap."""
    n, K = gridv.shape
    span = int(-offsets.min()) if (offsets < 0).any() else 0
    if span > SPAN_CAP:
        return None
    if B.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    nb = NB
    nblk = -(-n // nb)
    span_w = max(-(-span // nb) * nb, nb)
    n_pad = nblk * nb
    d = np.maximum(0, -offsets).astype(np.int32)    # 0 -> masked out
    p = B.shape[1]
    p_pad = -(-p // LANE) * LANE
    Dinv = _build_diag_inv(offsets, gridv, n, nblk, nb, unit, jnp.float32)
    gp = jnp.pad(gridv, ((0, n_pad - n), (0, 0)))
    Bp = jnp.pad(B, ((0, n_pad - n), (0, p_pad - p)))
    WIN = span_w + nb
    if (WIN + 2 * nb) * p_pad * 4 + nb * nb * 4 * 2 > 12 * 1024 * 1024:
        return None

    def kernel(d_ref, v_ref, dinv_ref, b_ref, out_ref, xwin, acc):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            xwin[...] = jnp.zeros((WIN, p_pad), jnp.float32)

        v = v_ref[...].astype(jnp.float32)
        i_row = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
        acc[...] = b_ref[...].astype(jnp.float32)

        def body(k, _):
            dk = d_ref[k]
            # row i of this block reads x[base + i - dk], held at window
            # row span_w + i - dk; dk=0 (diagonal / ignored uppers) and
            # intra-block entries (i >= dk) are masked out — they live in
            # the dense diagonal block.
            mask = (i_row < dk).astype(jnp.float32)
            vcol = jnp.take_along_axis(
                v, jnp.full((nb, K), k, jnp.int32), axis=1)[:, :1]
            xs = xwin[pl.ds(span_w - dk, nb), :]
            acc[...] = acc[...] - (vcol * mask) * xs
            return 0

        jax.lax.fori_loop(0, K, body, 0)
        xb = jnp.dot(dinv_ref[0], acc[...],
                     preferred_element_type=jnp.float32)
        xwin[pl.ds(span_w, nb), :] = xb
        out_ref[...] = xb.astype(out_ref.dtype)
        # roll the window down one block for the next step
        xwin[0:span_w, :] = xwin[pl.ds(nb, span_w), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nb, K), lambda b, d: (b, 0)),
            pl.BlockSpec((1, nb, nb), lambda b, d: (b, 0, 0)),
            pl.BlockSpec((nb, p_pad), lambda b, d: (b, 0)),
        ],
        out_specs=pl.BlockSpec((nb, p_pad), lambda b, d: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((WIN, p_pad), jnp.float32),
            pltpu.VMEM((nb, p_pad), jnp.float32),
        ],
    )
    @jax.custom_batching.sequential_vmap
    def run(gp, Dinv, Bp):
        # sequential under vmap: scratch carry + ANY-space operands
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, p_pad), B.dtype),
            interpret=_interpret(),
        )(as_device_array(d), gp, Dinv, Bp)

    return run(gp, Dinv, Bp)[:n, :p]
