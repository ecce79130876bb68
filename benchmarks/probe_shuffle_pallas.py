"""Pallas-stage probes for the 3-stage shuffle: XLA lowers
``take_along_axis`` to a generic gather (~24 ms at 3M — no better than a
flat take), so the stages must be Mosaic-native gathers inside Pallas
kernels.  These probes measure the candidate stage kernels:

  pl_lane     (T, 128) tiles, per-row lane gather (stages 1/3)
  pl_sub8     (8, 128) tiles, per-column sublane gather (block-local rows)
  pl_wide     (8, R) tiles, lane gather over R ~ 24k lanes (stage 2 after
              a transpose: within-column perm = within-row on (128, R))
  pl_pipe     full 3-stage pipeline: lane ∘ (T · wide · T) ∘ lane
"""

import argparse
import json
import sys

import numpy as np

ALL = ["pl_lane", "pl_sub8", "pl_wide", "pl_pipe"]


def chain(step, x0, rep=20, n_meas=4):
    # differenced chain (shared harness): cancels the fixed ~30 ms
    # per-dispatch tunnel cost (see docs/MEASUREMENT.md)
    from benchmarks.benchmark_utils import chain_diff
    return chain_diff(step, x0, rep=rep, n_meas=n_meas)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--only", default=None, choices=ALL)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    interp = args.small
    nnz = 300_032 if args.small else 3_088_000
    R = nnz // 128
    sel = [args.only] if args.only else ALL
    print(f"backend={jax.default_backend()} nnz={nnz} R={R} probes={sel}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    idx_lane = np.argsort(rng.random((R, 128)), axis=1).astype(np.int32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, 128), jnp.float32)
    eps = jnp.float32(1e-12)
    nb = nnz * 4 * 2

    def report(name, ms, bytes_moved=None, note=""):
        rec = {"probe": name, "ms": round(ms, 3)}
        if bytes_moved:
            rec["GBps"] = round(bytes_moved / ms * 1e3 / 1e9, 1)
        if note:
            rec["note"] = note
        print(json.dumps(rec), flush=True)

    T = 512
    Rpad = -(-R // T) * T

    def pad_rows(a, rows):
        if rows != a.shape[0]:
            return np.pad(a, ((0, rows - a.shape[0]), (0, 0)))
        return a

    def lane_fn(idx_np):
        idxp = jnp.asarray(pad_rows(idx_np, Rpad))

        def kern(i_ref, v_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(v_ref[...], i_ref[...], axis=1)

        spec = pl.BlockSpec((T, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

        def apply(v):
            vp = jnp.pad(v, ((0, Rpad - R), (0, 0))) if Rpad != R else v
            out = pl.pallas_call(
                kern, grid=(Rpad // T,), in_specs=[spec, spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((Rpad, 128), jnp.float32),
                interpret=interp,
            )(idxp, vp)
            return out[:R]

        return apply

    def run(name):
        if name == "pl_lane":
            f = lane_fn(idx_lane)
            ms, cs = chain(lambda a: f(a) + eps * a[0, 0], x)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "pl_sub8":
            idx8 = np.argsort(
                rng.random((Rpad // 8, 8, 128)), axis=1).astype(np.int32)
            idx8 = jnp.asarray(idx8.reshape(Rpad, 128))

            def kern(i_ref, v_ref, o_ref):
                o_ref[...] = jnp.take_along_axis(
                    v_ref[...], i_ref[...], axis=0)

            spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

            def f(v):
                vp = jnp.pad(v, ((0, Rpad - R), (0, 0)))
                return pl.pallas_call(
                    kern, grid=(Rpad // 8,), in_specs=[spec, spec],
                    out_specs=spec,
                    out_shape=jax.ShapeDtypeStruct((Rpad, 128),
                                                   jnp.float32),
                    interpret=interp,
                )(idx8, vp)[:R]

            ms, cs = chain(lambda a: f(a) + eps * a[0, 0], x)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name in ("pl_wide", "pl_pipe"):
            # within-column permutation via transpose: (R,128)->(128,R);
            # each of the 128 rows gets an independent R-length perm
            idx_wide = np.argsort(rng.random((128, R)),
                                  axis=1).astype(np.int32)
            iw = jnp.asarray(idx_wide)

            def kern_w(i_ref, v_ref, o_ref):
                o_ref[...] = jnp.take_along_axis(v_ref[...], i_ref[...],
                                                 axis=1)

            spec_w = pl.BlockSpec((8, R), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)

            def wide(vT):
                return pl.pallas_call(
                    kern_w, grid=(128 // 8,), in_specs=[spec_w, spec_w],
                    out_specs=spec_w,
                    out_shape=jax.ShapeDtypeStruct((128, R), jnp.float32),
                    interpret=interp,
                )(iw, vT)

            if name == "pl_wide":
                xT = jnp.asarray(np.asarray(x).T.copy())
                ms, cs = chain(lambda a: wide(a) + eps * a[0, 0], xT)
                report(name, ms, nb, f"compile {cs:.0f}s")
            else:
                f1 = lane_fn(idx_lane)
                f3 = lane_fn(idx_lane[::-1].copy())

                def step(a):
                    y = f1(a)
                    y = wide(y.T).T
                    return f3(y) + eps * a[0, 0]

                ms, cs = chain(step, x)
                report(name, ms, nb * 5, f"compile {cs:.0f}s")

    for name in sel:
        run(name)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main()
