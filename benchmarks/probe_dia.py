"""Micro-probes: DIA-engine step breakdown at cfd2-stencil scale.

Decomposes the round-2 train step (10.9 ms) into its passes so the
round-3 fusion work (VERDICT items 3) targets the right costs:

  fill          values_to_grid (window-gather relayout, nnz -> (n, K))
  unfill        grid_to_values (inverse relayout)
  spmm_core     the halo-window forward kernel alone (grid hoisted)
  sddmm_core    the SDDMM grid kernel alone
  spmm_t_core   the transposed (A^T G) kernel alone (shifted grid hoisted)
  shift         the K-column static grid shift alone
  fwd_full      fill + core (per-step forward under training)
  step_full     one fwd+bwd chained value_and_grad step (the headline)

One probe per process: ``python -m benchmarks.probe_dia --only NAME``.
"""

import argparse
import json
import sys

import numpy as np

ALL = ["fill", "unfill", "spmm_core", "spmm_core_bf16", "sddmm_core",
       "sddmm_core_bf16", "spmm_t_core", "spmm_vpu", "sddmm_vpu", "shift",
       "fwd_full", "step_full"]

N_ROWS = 123_440
M_RHS = 128
STENCIL_OFFSETS = sorted({0, 1, -1, 2, -2, 3, -3, 49, -49, 50, -50, 51,
                          -51, 2401, -2401, 2449, -2449, 2450, -2450,
                          2451, -2451, 2499, -2499, 2500, -2500})


def chain(step, x0, rep=20, n_meas=4, prepare=None, prep_args=()):
    # prepare/prep_args: thread operand values as TRACED ARGUMENTS, not
    # closure constants — a closed-over concrete grid (12 MB at cfd2
    # scale) triples the remote compile time (measured: 1045 s vs 356 s
    # for the identical kernel; round-4 "20-minute compile" gap 2).
    from .benchmark_utils import chain_diff
    return chain_diff(step, x0, rep=rep, n_meas=n_meas, prepare=prepare,
                      prep_args=prep_args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--only", default=None, choices=ALL)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    n = 12_344 if args.small else N_ROWS
    offsets = ([0, 1, -1, 5, -5] if args.small else STENCIL_OFFSETS)
    sel = [args.only] if args.only else ALL
    print(f"backend={jax.default_backend()} n={n} K={len(offsets)} "
          f"probes={sel}", file=sys.stderr)

    from torchsparsegradutils_tpu.kernels.dia import (
        _dia_sddmm_pallas, _spmm_core, _spmm_core_pallas, _transpose_grid,
        build_dia_plan, dia_sddmm, grid_to_values, values_to_grid)
    from torchsparsegradutils_tpu.utils.random_sparse import stencil_sparse

    key = jax.random.PRNGKey(0)
    A = stencil_sparse(key, (n, n), offsets, layout="csr")
    plan = build_dia_plan(A.row_sa(), A.col_sa(), n, n)
    assert plan is not None and not plan.is_hybrid
    data = A.data
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, M_RHS),
                          jnp.float32)
    G = jax.random.normal(jax.random.fold_in(key, 2), (n, M_RHS),
                          jnp.float32)
    grid0 = values_to_grid(plan, data)
    eps = jnp.float32(1e-12)

    def rep_probe(name):
        if name == "fill":
            ms, cs = chain(lambda d: d + eps * values_to_grid(
                plan, d).sum(), data)
        elif name == "unfill":
            ms, cs = chain(lambda g: g + eps * grid_to_values(
                plan, g).sum(), grid0)
        elif name == "spmm_core":
            # grid threaded as a traced arg + hoisted bf16 splits (a
            # closed-over concrete grid triples the remote compile time)
            from torchsparsegradutils_tpu.kernels.dia_mxu import (
                split_grid_for_mxu)

            def prep(g):
                gs = split_grid_for_mxu(g)
                return lambda b: b + eps * _spmm_core(
                    plan.offsets, plan.n, plan.m, g, b, gv_splits=gs)

            ms, cs = chain(None, B, prepare=prep, prep_args=(grid0,))
        elif name == "spmm_core_bf16":
            B16 = B.astype(jnp.bfloat16)

            def prep(g):
                return lambda b: b + _spmm_core(
                    plan.offsets, plan.n, plan.m, g, b) * eps.astype(
                        jnp.bfloat16)

            ms, cs = chain(None, B16, prepare=prep,
                           prep_args=(grid0.astype(jnp.bfloat16),))
        elif name == "sddmm_core":
            def prep(b):
                return lambda g: g + eps * jnp.reshape(
                    dia_sddmm(plan, g, b).sum(), ())

            ms, cs = chain(None, G, prepare=prep, prep_args=(B,))
        elif name == "sddmm_core_bf16":
            def prep(b):
                return lambda g: g + jnp.reshape(
                    dia_sddmm(plan, g, b).sum(), ()).astype(jnp.bfloat16
                                                            ) * jnp.bfloat16(1e-12)

            ms, cs = chain(None, G.astype(jnp.bfloat16), prepare=prep,
                           prep_args=(B.astype(jnp.bfloat16),))
        elif name == "spmm_t_core":
            offsets_T, shift = _transpose_grid(plan)

            def prep(g0):
                gT = shift(g0)
                return lambda g: g + eps * _spmm_core(
                    offsets_T, plan.m, plan.n, gT, g)

            ms, cs = chain(None, G, prepare=prep, prep_args=(grid0,))
        elif name == "spmm_vpu":
            # the round-2 VPU shift kernel, for MXU-vs-VPU comparison
            ms, cs = chain(lambda b: b + eps * _spmm_core_pallas(
                plan.offsets, plan.n, plan.m, grid0, b), B)
        elif name == "sddmm_vpu":
            ms, cs = chain(lambda g: g + eps * _dia_sddmm_pallas(
                plan, g, B).sum(), G)
        elif name == "shift":
            _, shift = _transpose_grid(plan)
            ms, cs = chain(lambda g: g + eps * shift(g)[:plan.n].sum(),
                           grid0)
        elif name == "fwd_full":
            # per-step value prep included: d changes every step, so the
            # fill cannot be hoisted out of the loop (training conditions)
            from torchsparsegradutils_tpu import sparse_mm

            def stepf(db):
                d, b = db
                out = sparse_mm(A.with_data(d), b)
                return (d + eps * out[0, 0], b + eps * out)

            ms, cs = chain(stepf, (data, B))
        elif name == "step_full":
            from torchsparsegradutils_tpu import sparse_mm
            grad = jax.grad(
                lambda d, b: (sparse_mm(A.with_data(d), b) * G).sum(),
                argnums=(0, 1))

            def step(db):
                d, b = db
                gd, gb = grad(d, b)
                return (d + eps * gd, b + eps * gb)

            ms, cs = chain(step, (data, B))
        print(json.dumps({"probe": name, "ms": round(ms, 3),
                          "note": f"compile {cs:.0f}s"}), flush=True)

    for name in sel:
        rep_probe(name)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main()
