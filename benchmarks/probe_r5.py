"""Round-5 micro-probes: MXU-core decomposition + column-reorder costs.

Three clusters of questions, one probe per process
(``python -m benchmarks.probe_r5 --only NAME``):

1. **Compile-wedge bisect** (round-4 gap 2: the ``probe_dia spmm_core``
   chain takes >20 min to remote-compile while bench.py compiles the
   same kernel in ~3 min).  ``spmm_core_arg`` threads the value grid as
   a *traced argument* with hoisted bf16 splits (bench.py's ``prepare``
   pattern); ``spmm_core_const`` closes over the concrete grid like the
   wedging probe.  If only the latter wedges, the trigger is the
   captured-constant path.

2. **MXU core decomposition** (VERDICT r4 item 1): ``spmm_core_arg`` is
   the honest per-step core cost (fill hoisted, values traced);
   ``sddmm_core_arg`` likewise.  Variants land here as the kernel is
   reworked.

3. **Column-reorder strategies** (VERDICT r4 items 3/5): the CSC value
   permutation behind ``lse_dim0`` / bidir / the triangular-solve
   backward costs ~19-22 ms at 3M entries as a flat scalar ``take``.
   ``reorder_take`` measures that floor; ``reorder_expand`` measures the
   (nnz, 128) expansion-write + row-gather alternative (scalars ride
   512-byte rows — the same per-entry transaction count, far fewer
   per-element ops); ``gather_rows_only`` isolates the gather half.
"""

import argparse
import json
import os
import sys

import numpy as np

ALL = [
    "spmm_core_arg", "spmm_core_arg_bf16", "spmm_core_const",
    "sddmm_core_arg",
    "reorder_take", "reorder_expand", "expand_write", "gather_rows_only",
    "permute_lib", "benes", "benes_bwd",
    "hybrid_fwd", "hybrid_bwd", "hybrid_resid_bwd", "hybrid_dia_bwd",
    "random_bwd",
]

N_ROWS = 123_440
M_RHS = 128
NNZ_RAND = 3_087_898
STENCIL_OFFSETS = sorted({0, 1, -1, 2, -2, 3, -3, 49, -49, 50, -50, 51,
                          -51, 2401, -2401, 2449, -2449, 2450, -2450,
                          2451, -2451, 2499, -2499, 2500, -2500})


def chain(step, x0, rep=20, n_meas=4, prepare=None, prep_args=()):
    import time

    import jax
    import jax.numpy as jnp

    @jax.jit
    def many_r(x, r, *pa):
        s = step if prepare is None else prepare(*pa)
        return jax.lax.fori_loop(0, r, lambda i, y: s(y), x)

    def bind(r):
        rr = jnp.int32(r)
        return lambda x, *pa: many_r(x, rr, *pa)

    many1, many2 = bind(rep), bind(2 * rep)
    t0 = time.perf_counter()
    for many in (many1, many2):
        out = many(x0, *prep_args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.ravel()[0])
    compile_s = time.perf_counter() - t0

    def timed(many):
        t1 = time.perf_counter()
        out = many(x0, *prep_args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.ravel()[0])
        return time.perf_counter() - t1

    ts = []
    for _ in range(n_meas):
        t1 = timed(many1)
        t2 = timed(many2)
        ts.append(max(t2 - t1, 0.0) / rep * 1e3)
    return float(np.median(ts)), compile_s


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
    n = 12_344 if args.small else N_ROWS
    nnz = 300_032 if args.small else NNZ_RAND
    offsets = ([0, 1, -1, 5, -5] if args.small else STENCIL_OFFSETS)
    sel = [args.only] if args.only else ALL
    print(f"backend={jax.default_backend()} n={n} probes={sel}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    eps = jnp.float32(1e-12)

    def run(name):
        if name in ("spmm_core_arg", "spmm_core_arg_bf16",
                    "spmm_core_const", "sddmm_core_arg"):
            from torchsparsegradutils_tpu.kernels.dia import (
                _spmm_core, build_dia_plan, dia_sddmm, values_to_grid)
            from torchsparsegradutils_tpu.kernels.dia_mxu import (
                split_grid_for_mxu)
            from torchsparsegradutils_tpu.utils.random_sparse import (
                stencil_sparse)
            A = stencil_sparse(key, (n, n), offsets, layout="csr")
            plan = build_dia_plan(A.row_sa(), A.col_sa(), n, n)
            B = jax.random.normal(jax.random.fold_in(key, 1), (n, M_RHS),
                                  jnp.float32)
            G = jax.random.normal(jax.random.fold_in(key, 2), (n, M_RHS),
                                  jnp.float32)
            if name in ("spmm_core_arg", "spmm_core_arg_bf16"):
                # bench.py's prepare pattern: grid enters as a traced
                # argument, bf16 splits hoisted out of the loop.  The
                # bf16 variant measures the 1-MXU-pass storage fast path
                # (core floor 0.123 ms at cfd2 scale) — everything above
                # that is per-sub-tile overhead.
                if name.endswith("bf16"):
                    A = A.with_data(A.data.astype(jnp.bfloat16))
                    B = B.astype(jnp.bfloat16)

                def prep(d):
                    gv = values_to_grid(plan, d)
                    gs = split_grid_for_mxu(gv)
                    return lambda b: b + eps.astype(b.dtype) * _spmm_core(
                        plan.offsets, plan.n, plan.m, gv, b, gv_splits=gs)

                ms, cs = chain(None, B, prepare=prep, prep_args=(A.data,))
            elif name == "spmm_core_const":
                grid0 = values_to_grid(plan, A.data)
                jax.block_until_ready(grid0)
                ms, cs = chain(lambda b: b + eps * _spmm_core(
                    plan.offsets, plan.n, plan.m, grid0, b), B)
            else:
                def prep(g):
                    return lambda x: x + eps * jnp.reshape(
                        dia_sddmm(plan, x, B).sum(), ())

                ms, cs = chain(None, G, prepare=prep, prep_args=(G,))
            report(name, ms, note=f"compile {cs:.0f}s")
            return

        if name == "random_bwd":
            # pure-chunk backward pair on the uniform random pattern
            # (TSGU_SPMM_BWD selects fused / split): the d_data + d_B
            # cost of the mm-suite random fwd_bwd row minus the forward
            from torchsparsegradutils_tpu.kernels.chunk_spmm import (
                chunk_gather)
            from torchsparsegradutils_tpu.ops.spmm import (
                _chunk_plan, _spmm_bwd_pair)
            from torchsparsegradutils_tpu.utils import rand_sparse
            A = rand_sparse(key, (n, n), nnz, layout="csr")
            B = jax.random.normal(jax.random.fold_in(key, 1), (n, M_RHS),
                                  jnp.float32)
            G = jax.random.normal(jax.random.fold_in(key, 2), (n, M_RHS),
                                  jnp.float32)
            plan = _chunk_plan(A, "pallas")

            def prep(d, b):
                pg = chunk_gather(plan, b)

                def stepf(g):
                    dd, db = _spmm_bwd_pair("pallas", "exact",
                                            A.with_data(d), b, g, pg)
                    return g + eps * (dd.sum() + db.sum())
                return stepf

            ms, cs = chain(None, G, prepare=prep, prep_args=(A.data, B))
            report(name, ms, note=f"compile {cs:.0f}s "
                   f"mode={os.environ.get('TSGU_SPMM_BWD', 'fused')}")
            return

        if name.startswith("hybrid_"):
            # hybrid70 step breakdown (VERDICT r4 item 8: the measured
            # 50 ms step vs its ~30 ms component budget).  Operands are
            # threaded as traced arguments (prepare) — training
            # conditions, nothing folds.
            from torchsparsegradutils_tpu.kernels.dia import (
                _dia_sddmm_grid, _resid_chunk_plans, _spmm_core,
                _transpose_grid, build_dia_plan, dia_bwd_pair, dia_spmm,
                grid_to_values, resid_values, values_to_grid)
            from torchsparsegradutils_tpu.utils.random_sparse import (
                hybrid_sparse)
            # cap nnz so 70 % fits the diagonal capacity at --small scale
            nnz_h = min(nnz, int(0.8 * n * len(offsets) / 0.7))
            A = hybrid_sparse(key, (n, n), offsets, nnz_h,
                              dia_coverage=0.7, layout="csr")
            plan = build_dia_plan(A.row_sa(), A.col_sa(), n, n)
            assert plan is not None and plan.is_hybrid
            B = jax.random.normal(jax.random.fold_in(key, 1), (n, M_RHS),
                                  jnp.float32)
            G = jax.random.normal(jax.random.fold_in(key, 2), (n, M_RHS),
                                  jnp.float32)
            if name == "hybrid_fwd":
                def prep(d):
                    return lambda b: b + eps * dia_spmm(plan, d, b)
                ms, cs = chain(None, B, prepare=prep, prep_args=(A.data,))
            elif name == "hybrid_bwd":
                def prep(d, b):
                    def stepf(g):
                        dd, db = dia_bwd_pair(plan, d, b, g)
                        return g + eps * (dd.sum() + db.sum())
                    return stepf
                ms, cs = chain(None, G, prepare=prep,
                               prep_args=(A.data, B))
            elif name == "hybrid_resid_bwd":
                from torchsparsegradutils_tpu.kernels.chunk_spmm import (
                    chunk_spmm_bwd_fused)
                rp, rpt = _resid_chunk_plans(plan)

                def prep(d, b):
                    rv = resid_values(plan, d)

                    def stepf(g):
                        dd, db = chunk_spmm_bwd_fused(rp, rpt, rv, b, g)
                        return g + eps * (dd.sum() + db.sum())
                    return stepf
                ms, cs = chain(None, G, prepare=prep,
                               prep_args=(A.data, B))
            else:  # hybrid_dia_bwd: the pure-DIA terms of the pair
                def prep(d, b):
                    gv = values_to_grid(plan, d)
                    offsets_T, shift = _transpose_grid(plan)
                    gs = shift(gv)

                    def stepf(g):
                        dd = grid_to_values(
                            plan, _dia_sddmm_grid(plan, g, b))
                        db = _spmm_core(offsets_T, plan.m, plan.n, gs, g)
                        return g + eps * (dd.sum() + db.sum())
                    return stepf
                ms, cs = chain(None, G, prepare=prep,
                               prep_args=(A.data, B))
            report(name, ms, note=f"compile {cs:.0f}s")
            return

        # ---- column-reorder strategies --------------------------------
        rng = np.random.default_rng(0)
        perm = rng.permutation(nnz).astype(np.int32)
        v = jax.random.normal(key, (nnz,), jnp.float32)
        if name == "reorder_take":
            p = jnp.asarray(perm)
            ms, cs = chain(lambda a: jnp.take(a, p) + eps * a[0], v)
            report(name, ms, nnz * 4 * 2, f"compile {cs:.0f}s")
        elif name == "reorder_expand":
            p = jnp.asarray(perm)

            def step(a):
                E = jnp.pad(a[:, None], ((0, 0), (0, 127)))
                got = jnp.take(E, p, axis=0)[:, 0]
                return got + eps * a[0]

            ms, cs = chain(step, v)
            report(name, ms, nnz * 512 * 2, f"compile {cs:.0f}s")
        elif name == "expand_write":
            def step(a):
                E = jnp.pad(a[:, None], ((0, 0), (0, 127)))
                return a + eps * E[0].sum()

            ms, cs = chain(step, v)
            report(name, ms, nnz * 512, f"compile {cs:.0f}s")
        elif name == "permute_lib":
            # the real library path (kernels/shuffle.py:permute_values):
            # expansion + barriers + row gather; chained output feeds the
            # next iteration so nothing can be DCE'd or fused away.
            from torchsparsegradutils_tpu.kernels.shuffle import (
                permute_values)
            from torchsparsegradutils_tpu.types import StaticArray
            sa = StaticArray(np.ascontiguousarray(perm.astype(np.int64)))
            ms, cs = chain(lambda a: permute_values(sa, a) + eps * a[0], v)
            report(name, ms, nnz * 4 * 2, f"compile {cs:.0f}s")
        elif name in ("benes", "benes_bwd"):
            # Beneš exchange-network permutation (kernels/benes.py): the
            # same CSC-order reorder as reorder_take, as 43 oblivious
            # streaming stages instead of 3M scattered transactions.
            from torchsparsegradutils_tpu.kernels.benes import benes_permute
            from torchsparsegradutils_tpu.types import StaticArray
            sa = StaticArray(np.ascontiguousarray(perm.astype(np.int64)))
            inv = name == "benes_bwd"
            ms, cs = chain(
                lambda a: benes_permute(sa, a, inverse=inv) + eps * a[0], v)
            report(name, ms, nnz * 4 * 2, f"compile {cs:.0f}s")
        elif name == "gather_rows_only":
            p = jnp.asarray(perm)
            E = jax.random.normal(key, (nnz, 128), jnp.float32)

            def step(st):
                a, e = st
                got = jnp.take(e, p, axis=0)
                return (a + eps * got[0, 0], e)

            ms, cs = chain(step, (v, E))
            report(name, ms, nnz * 512, f"compile {cs:.0f}s")

    for name in sel:
        run(name)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main()
