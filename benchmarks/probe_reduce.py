"""Micro-probes: masked row-LSE reduction formulations over value grids.

The ELL/DIA logsumexp paths reduce a ``(n, K)`` value grid over its minor
axis (K ~ 25-48).  Full-scale suite runs show the whole LSE stuck at
5-8 ms for a 12 MB stream — the reduce, not the fill, dominates.  These
probes time candidate formulations at cfd2 scale so the op can pick the
one that streams:

  red_nk        jnp.max + exp/sum over axis=1 of (n, K)   (status quo)
  red_nk_pad    same but K padded to 128 lanes
  red_kn        transpose to (K, n), jnp reductions over axis=0
  red_kn_unroll transpose to (K, n), unrolled elementwise max/add chain
  transpose_nk  the (n, K) -> (K, n) relayout alone
  lse_full_kn   the complete masked-LSE chain in (K, n) layout
"""

import argparse
import json
import sys
import time

import numpy as np

ALL = ["red_nk", "red_nk_pad", "red_kn", "red_kn_unroll", "transpose_nk",
       "lse_full_kn"]


def chain(step, x0, rep=20, n_meas=4):
    from .benchmark_utils import chain_diff
    return chain_diff(step, x0, rep=rep, n_meas=n_meas)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--only", default=None, choices=ALL)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    n = 12_344 if args.small else 123_440
    K = 25
    sel = [args.only] if args.only else ALL
    print(f"backend={jax.default_backend()} n={n} K={K} probes={sel}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (n, K), jnp.float32)
    XT = jnp.asarray(np.asarray(X).T.copy())
    valid = jnp.asarray(np.random.default_rng(0).random((n, K)) < 0.9)
    validT = valid.T
    nb = n * K * 4
    eps = jnp.float32(1e-12)

    def report(name, ms, bytes_moved=None, note=""):
        rec = {"probe": name, "ms": round(ms, 3)}
        if bytes_moved:
            rec["GBps"] = round(bytes_moved / ms * 1e3 / 1e9, 1)
        if note:
            rec["note"] = note
        print(json.dumps(rec), flush=True)

    def run(name):
        if name == "red_nk":
            def step(a):
                M = jnp.max(a, axis=1)
                S = jnp.exp(a - M[:, None]).sum(axis=1)
                return a.at[0, 0].add(eps * (M[0] + S[0]))
            ms, cs = chain(step, X)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "red_nk_pad":
            Xp = jnp.pad(X, ((0, 0), (0, 128 - K)),
                         constant_values=-np.inf)

            def step(a):
                M = jnp.max(a, axis=1)
                S = jnp.where(jnp.isfinite(a), jnp.exp(a - M[:, None]),
                              0.0).sum(axis=1)
                return a.at[0, 0].add(eps * (M[0] + S[0]))
            ms, cs = chain(step, Xp)
            report(name, ms, n * 128 * 4, f"compile {cs:.0f}s")
        elif name == "red_kn":
            def step(a):
                M = jnp.max(a, axis=0)
                S = jnp.exp(a - M[None, :]).sum(axis=0)
                return a.at[0, 0].add(eps * (M[0] + S[0]))
            ms, cs = chain(step, XT)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "red_kn_unroll":
            def step(a):
                M = a[0]
                for k in range(1, K):
                    M = jnp.maximum(M, a[k])
                S = jnp.exp(a[0] - M)
                for k in range(1, K):
                    S = S + jnp.exp(a[k] - M)
                return a.at[0, 0].add(eps * (M[0] + S[0]))
            ms, cs = chain(step, XT)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "transpose_nk":
            def step(a):
                t = a.T
                return a.at[0, 0].add(eps * t[0, 0])
            ms, cs = chain(step, X)
            report(name, ms, nb * 2, f"compile {cs:.0f}s")
        elif name == "lse_full_kn":
            cnt = validT.sum(axis=0)
            nzero = (n - cnt).astype(jnp.float32)

            def step(a):
                NEG = jnp.float32(-np.inf)
                M = jnp.where(validT[0], a[0], NEG)
                for k in range(1, K):
                    M = jnp.maximum(M, jnp.where(validT[k], a[k], NEG))
                M = jnp.where(nzero > 0, jnp.maximum(M, 0.0), M)
                Ms = jnp.where(jnp.isfinite(M), M, 0.0)
                S = jnp.where(validT[0], jnp.exp(a[0] - Ms), 0.0)
                for k in range(1, K):
                    S = S + jnp.where(validT[k], jnp.exp(a[k] - Ms), 0.0)
                S = S + jnp.where(nzero > 0, nzero * jnp.exp(-Ms), 0.0)
                out = Ms + jnp.log(jnp.where(S == 0, 1.0, S))
                return a.at[0, 0].add(eps * out[0])
            ms, cs = chain(step, XT)
            report(name, ms, nb, f"compile {cs:.0f}s")

    for name in sel:
        run(name)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main()
