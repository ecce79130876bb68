"""Micro-probes for the 3-stage static-permutation (shuffle) design.

A general static permutation of nnz values costs ~22 ms at 3M entries as
an XLA flat gather (per-scalar transactions).  The shuffle design routes
the same permutation as lane/sublane stages on an (R, 128) layout
(classic 3-stage Clos routing: within-row perm -> within-column perm ->
within-row perm, with the column assignment from a 128-edge-coloring of
the source-row/dest-row bipartite multigraph).  Each stage is a
take_along_axis whose gather indices vary only along one axis — this
probe measures whether XLA lowers those to stream-speed ops on the v5e,
which gates the whole design:

  take_flat      jnp.take(v, perm) baseline (the ~22 ms status quo)
  talong1        take_along_axis(x,(R,128),axis=1)  lane stage
  talong0        take_along_axis(x,(R,128),axis=0)  sublane stage, direct
  transpose      (R,128)->(128,R) copy
  talong1_wide   take_along_axis on (128,R) axis=1 (sublane stage via T)
  pipe_direct    stage1 + talong0 + stage3
  pipe_transpose stage1 + T + talong1_wide + T + stage3

Run one probe per process on the real chip:
  for p in ...; do python -m benchmarks.probe_shuffle --only $p; done
"""

import argparse
import json
import sys
import time

import numpy as np

ALL = ["take_flat", "talong1", "talong0", "transpose", "talong1_wide",
       "pipe_direct", "pipe_transpose", "shuffle_real"]


def chain(step, x0, rep=20, n_meas=4):
    # differenced chain (shared harness): cancels the fixed ~30 ms
    # per-dispatch tunnel cost that would otherwise inflate rep=20
    # readings by ~1.5 ms/step — the same magnitude as a shuffle stage
    from benchmarks.benchmark_utils import chain_diff
    return chain_diff(step, x0, rep=rep, n_meas=n_meas)


def report(name, ms, bytes_moved=None, note=""):
    rec = {"probe": name, "ms": round(ms, 3)}
    if bytes_moved:
        rec["GBps"] = round(bytes_moved / ms * 1e3 / 1e9, 1)
    if note:
        rec["note"] = note
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--only", default=None, choices=ALL)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    nnz = 300_032 if args.small else 3_088_000  # multiple of 128
    R = nnz // 128
    sel = [args.only] if args.only else ALL
    print(f"backend={jax.default_backend()} nnz={nnz} R={R} probes={sel}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    perm_flat = rng.permutation(nnz).astype(np.int32)
    # independent per-row lane permutations and per-column row permutations
    idx_lane = np.argsort(rng.random((R, 128)), axis=1).astype(np.int32)
    idx_sub = np.argsort(rng.random((R, 128)), axis=0).astype(np.int32)
    idx_wide = np.argsort(rng.random((128, R)), axis=1).astype(np.int32)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, 128), jnp.float32)
    eps = jnp.float32(1e-12)
    nb = nnz * 4 * 2  # read + write

    def dep(y, prev):
        # keep the chain data-dependent without changing the layout
        return y.at[0, 0].add(eps * prev.ravel()[0] * 0)

    def run(name):
        if name == "take_flat":
            p = jnp.asarray(perm_flat)
            ms, cs = chain(
                lambda a: jnp.take(a.ravel(), p).reshape(R, 128)
                + eps * a[0, 0], x)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "talong1":
            i1 = jnp.asarray(idx_lane)
            ms, cs = chain(
                lambda a: jnp.take_along_axis(a, i1, axis=1)
                + eps * a[0, 0], x)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "talong0":
            i0 = jnp.asarray(idx_sub)
            ms, cs = chain(
                lambda a: jnp.take_along_axis(a, i0, axis=0)
                + eps * a[0, 0], x)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "transpose":
            ms, cs = chain(
                lambda a: a.T.reshape(R, 128) + eps * a[0, 0], x)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "talong1_wide":
            iw = jnp.asarray(idx_wide)
            xw = x.T.copy()
            ms, cs = chain(
                lambda a: jnp.take_along_axis(a, iw, axis=1)
                + eps * a[0, 0], xw)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "pipe_direct":
            i1 = jnp.asarray(idx_lane)
            i0 = jnp.asarray(idx_sub)
            i3 = jnp.asarray(idx_lane[::-1].copy())

            def step(a):
                y = jnp.take_along_axis(a, i1, axis=1)
                y = jnp.take_along_axis(y, i0, axis=0)
                return jnp.take_along_axis(y, i3, axis=1) + eps * a[0, 0]

            ms, cs = chain(step, x)
            report(name, ms, nb * 3, f"compile {cs:.0f}s")
        elif name == "pipe_transpose":
            i1 = jnp.asarray(idx_lane)
            iw = jnp.asarray(idx_wide)
            i3 = jnp.asarray(idx_lane[::-1].copy())

            def step(a):
                y = jnp.take_along_axis(a, i1, axis=1)
                y = jnp.take_along_axis(y.T, iw, axis=1).T
                return jnp.take_along_axis(y, i3, axis=1) + eps * a[0, 0]

            ms, cs = chain(step, x)
            report(name, ms, nb * 5, f"compile {cs:.0f}s")
        elif name == "shuffle_real":
            from torchsparsegradutils_tpu.kernels.shuffle import (
                build_shuffle_plan, shuffle_values)
            t0 = time.perf_counter()
            plan = build_shuffle_plan(perm_flat.astype(np.int64), nnz)
            plan_s = time.perf_counter() - t0
            if plan is None:
                report(name, -1.0, note="no plan (native unavailable)")
                return
            v = x.ravel()
            ms, cs = chain(
                lambda a: shuffle_values(plan, a) + eps * a[0], v)
            report(name, ms, nb * 3,
                   f"compile {cs:.0f}s, plan {plan_s:.1f}s")

    for name in sel:
        run(name)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main()
