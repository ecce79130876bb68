"""Inverse screened-Poisson problem on the DIA + CG + IFT stack.

A 2-D screened-Poisson operator ``A(θ) = L + diag(exp(θ))`` (5-point
Laplacian plus an unknown per-cell screening field) is a 5-diagonal
stencil matrix — exactly the pattern class this library's DIA engine
executes as shifted dense streams.  We observe ``y = A(θ*)⁻¹ f`` for a
hidden field ``θ*`` and recover it by gradient descent on
``‖A(θ)⁻¹ f − y‖²``:

* the solve runs conjugate gradients (``lax.while_loop``) over the
  hoisted DIA matvec;
* gradients w.r.t. θ come from ``sparse_generic_solve``'s
  implicit-function-theorem backward — the CG loop itself is never
  differentiated through, and ``∂loss/∂A`` is assembled only at the
  operator's stored nonzeros.

Run: ``python -m examples.fit_conductivity_poisson`` (CPU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from torchsparsegradutils_tpu import sparse_generic_solve
from torchsparsegradutils_tpu.solvers import LinearCGSettings, linear_cg
from torchsparsegradutils_tpu.types import SparseCSR

NX = NY = 24
N = NX * NY


def laplacian_pattern():
    """CSR pattern of the 5-point Laplacian on an NX x NY grid, plus the
    per-entry assembly metadata (is_diag mask)."""
    rows, cols = [], []
    for i in range(N):
        x, y = divmod(i, NY)
        for dx, dy in ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)):
            xx, yy = x + dx, y + dy
            if 0 <= xx < NX and 0 <= yy < NY:
                rows.append(i)
                cols.append(xx * NY + yy)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    indptr = np.zeros(N + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    return rows, cols, np.cumsum(indptr), rows == cols


ROWS, COLS, INDPTR, IS_DIAG = laplacian_pattern()


def operator(theta):
    """A(θ) = L + diag(exp(θ)) as a static-pattern CSR container."""
    vals = jnp.where(jnp.asarray(IS_DIAG),
                     4.0 + jnp.exp(theta)[jnp.asarray(ROWS)],
                     -1.0)
    return SparseCSR(INDPTR.astype(np.int32), COLS.astype(np.int32),
                     vals, (N, N))


def solve(theta, f):
    return sparse_generic_solve(
        operator(theta), f, solve=linear_cg, transpose_solve=linear_cg,
        settings=LinearCGSettings(max_iter=300, rtol=1e-8))


def main():
    key = jax.random.PRNGKey(0)
    xs = jnp.arange(NX)[:, None] / NX
    ys = jnp.arange(NY)[None, :] / NY
    theta_true = (0.8 * jnp.sin(2 * jnp.pi * xs)
                  * jnp.cos(2 * jnp.pi * ys)).reshape(-1)
    f = jax.random.normal(key, (N,))
    y_obs = solve(theta_true, f)

    import optax
    opt = optax.adam(5e-2)

    @jax.jit
    def step(theta, state):
        loss, g = jax.value_and_grad(
            lambda t: ((solve(t, f) - y_obs) ** 2).sum() * 1e2)(theta)
        updates, state = opt.update(g, state)
        return optax.apply_updates(theta, updates), state, loss

    theta = jnp.zeros((N,))
    state = opt.init(theta)
    for it in range(150):
        theta, state, loss = step(theta, state)
        if it % 15 == 0:
            err = float(jnp.abs(theta - theta_true).mean())
            print(f"iter {it:3d}  loss {float(loss):.3e}  "
                  f"mean |θ−θ*| {err:.3f}", flush=True)
    final_err = float(jnp.abs(theta - theta_true).mean())
    print(f"final mean |θ−θ*| = {final_err:.3f} "
          f"(initial {float(jnp.abs(theta_true).mean()):.3f})")
    assert final_err < 0.35 * float(jnp.abs(theta_true).mean())
    print("recovered the conductivity field.")


if __name__ == "__main__":
    main()
