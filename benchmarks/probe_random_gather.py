"""Micro-probes: where the uniform-random SpMM time actually goes on TPU.

Round-3 evidence gathering for the generic-pattern performance work
(VERDICT r2 items 1-2).  Each probe is a chained-dependency loop (the
only trustworthy timing mode on the tunnelled chip — see
``benchmark_utils.measure_chained``) around ONE primitive of the random
SpMM pipeline, so the pipeline's cost model can be decomposed:

  stream_read    read (nnz, p) f32 at HBM stream speed (the ceiling)
  gather_csr     random B-row gather in CSR entry order (the fwd's core)
  gather_sorted  same rows, column-sorted order (monotone, ~25x repeats)
  gather_unique  monotone near-dense gather (the "Bu" rank-stream)
  gather_bf16    random gather at half row bytes
  gather_p64     random gather at 256-byte rows (transaction effect)
  scalar_gather  p=1 value gather (the Krylov matvec's core)
  gather_mat     gather whose result must also be written back to HBM
  spmm_auto      current sparse_mm forward (pallas chunk path)
  spmm_xla       gather + sorted segment_sum forward
  spmv_p1        current SpMV forward
  seg_sorted     sorted row-wise scatter-add of (nnz, p) rows
  seg_unsorted   unsorted scatter-add (the transpose/backward primitive)

Run on the real chip one probe per process (the tunnel wedges multi-hour
processes): ``for p in ...; do python -m benchmarks.probe_random_gather
--only $p; done``.  ``--small`` runs a CPU smoke pass.  Prints one JSON
line per probe.
"""

import argparse
import json
import sys
import time

import numpy as np

ALL = ["stream_read", "gather_csr", "gather_sorted", "gather_unique",
       "gather_bf16", "gather_p64", "scalar_gather",
       "scalar_gather_sorted", "gather_mat", "spmm_auto", "spmm_xla",
       "spmv_p1", "seg_sorted", "seg_unsorted",
       "chunk_kernel_pg", "chunk_combine"]


_SMALL = False


def chain(step, x0, rep=20, n_meas=4):
    from .benchmark_utils import chain_diff
    if _SMALL:          # CPU smoke: interpret-mode Pallas is ~1000x slower
        rep, n_meas = 1, 1
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
        global _SMALL
        _SMALL = True
    n = 12_344 if args.small else 123_440
    nnz = 300_000 if args.small else 3_087_898
    p = 128
    sel = [args.only] if args.only else ALL
    print(f"backend={jax.default_backend()} n={n} nnz={nnz} p={p} "
          f"probes={sel}", file=sys.stderr)

    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
    cols_in_row = rng.integers(0, n, nnz).astype(np.int32)  # CSR-ish order

    key = jax.random.PRNGKey(0)
    B = jax.random.normal(key, (n, p), jnp.float32)
    eps = jnp.float32(1e-12)

    def dep(acc, s):
        return acc.at[(0,) * acc.ndim].add(
            (eps * s.astype(jnp.float32)).astype(acc.dtype))

    def run(name):
        if name == "stream_read":
            big = jax.random.normal(key, (nnz, p), jnp.float32)
            ms, cs = chain(lambda a: dep(a, a.sum()), big)
            report(name, ms, nnz * p * 4, f"compile {cs:.0f}s")
        elif name in ("gather_csr", "gather_sorted", "gather_unique",
                      "gather_bf16"):
            if name == "gather_sorted":
                idx = jnp.asarray(np.sort(cols_in_row))
            elif name == "gather_unique":
                idx = jnp.asarray(np.unique(cols_in_row))
            else:
                idx = jnp.asarray(cols_in_row)
            src = B.astype(jnp.bfloat16) if name == "gather_bf16" else B
            nb = idx.shape[0] * src.shape[1] * src.dtype.itemsize
            ms, cs = chain(lambda a: dep(a, jnp.take(
                a, idx, axis=0).sum()), src)
            report(name, ms, nb, f"compile {cs:.0f}s")
        elif name == "gather_p64":
            idx = jnp.asarray(cols_in_row)
            B64 = B[:, :64]
            ms, cs = chain(lambda a: dep(a, jnp.take(
                a, idx, axis=0).sum()), B64)
            report(name, ms, nnz * 64 * 4, f"compile {cs:.0f}s")
        elif name in ("scalar_gather", "scalar_gather_sorted"):
            idx = jnp.asarray(np.sort(cols_in_row) if "sorted" in name
                              else cols_in_row)
            x1 = jax.random.normal(key, (n,), jnp.float32)
            ms, cs = chain(lambda a: dep(a, jnp.take(a, idx).sum()), x1)
            report(name, ms, nnz * 4, f"compile {cs:.0f}s")
        elif name == "gather_mat":
            idx = jnp.asarray(cols_in_row)
            big = jnp.zeros((nnz, p), jnp.float32)

            def mat_step(st):
                a, g_prev = st
                g = jnp.take(a, idx, axis=0) + g_prev[0, 0] * eps
                return a.at[0, 0].add(eps * g[0, 0]), g

            ms, cs = chain(mat_step, (B, big))
            report(name, ms, nnz * p * 4 * 2,
                   f"compile {cs:.0f}s; bytes = gather read + write")
        elif name in ("spmm_auto", "spmm_xla", "spmv_p1"):
            from torchsparsegradutils_tpu import SparseCSR, sparse_mm
            val = jax.random.normal(key, (nnz,), jnp.float32)
            indptr = np.zeros(n + 1, np.int64)
            np.add.at(indptr, rows + 1, 1)
            np.cumsum(indptr, out=indptr)
            order = np.lexsort((cols_in_row, rows))
            A = SparseCSR(indptr.astype(np.int32), cols_in_row[order],
                          val, (n, n))
            if name == "spmv_p1":
                from torchsparsegradutils_tpu.solvers.common import (
                    as_matvec)
                mv = as_matvec(A)
                x1 = jax.random.normal(key, (n,), jnp.float32)
                ms, cs = chain(lambda b: b + eps * mv(b), x1)
            else:
                bk = name.split("_")[1]
                ms, cs = chain(
                    lambda b: b + eps * sparse_mm(A, b, backend=bk), B)
            report(name, ms, None, f"compile {cs:.0f}s")
        elif name in ("chunk_kernel_pg", "chunk_combine"):
            # decompose the chunk fwd: kernel-only (pg pre-gathered and
            # loop-invariant; data varies so nothing else hoists) and the
            # sorted partial-combine alone
            from torchsparsegradutils_tpu.kernels.chunk_spmm import (
                _combine, build_chunk_plan, chunk_gather, chunk_spmm)
            from torchsparsegradutils_tpu.types import StaticArray
            order = np.lexsort((cols_in_row, rows))
            rs = StaticArray(rows[order])
            cs_sa = StaticArray(cols_in_row[order])
            plan = build_chunk_plan(rs, cs_sa, n, n)
            if plan is None:
                report(name, float("nan"), note="no chunk plan")
                return
            if name == "chunk_kernel_pg":
                pg = chunk_gather(plan, B)
                jax.block_until_ready(pg)
                val = jax.random.normal(key, (nnz,), jnp.float32)
                ms, cs = chain(
                    lambda d: d + eps * chunk_spmm(plan, d, B,
                                                   pg=pg).sum(), val)
                report(name, ms, None,
                       f"compile {cs:.0f}s; kernel+combine, no gather")
            else:
                part = jax.random.normal(
                    key, (plan.nchunks, plan.W, p), jnp.float32)

                def comb_step(st):
                    a, pt = st
                    out = _combine(plan, pt * (1 + a[0, 0] * eps), p)
                    return a.at[0, 0].add(eps * out[0, 0]), pt

                ms, cs = chain(comb_step, (B, part))
                report(name, ms, plan.nchunks * plan.W * p * 4,
                       f"compile {cs:.0f}s; W={plan.W} nchunks="
                       f"{plan.nchunks}")
        elif name in ("seg_sorted", "seg_unsorted"):
            idx = jnp.asarray(rows if name == "seg_sorted" else cols_in_row)
            big = jax.random.normal(key, (nnz, p), jnp.float32)
            ms, cs = chain(
                lambda a: dep(a, jax.ops.segment_sum(
                    big * (1 + a[0, 0] * eps), idx,
                    num_segments=n).sum()), B)
            report(name, ms, nnz * p * 4, f"compile {cs:.0f}s")

    for name in sel:
        run(name)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main()
