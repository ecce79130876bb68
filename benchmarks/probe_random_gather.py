"""Micro-probes: where the uniform-random SpMM time actually goes on TPU.

Round-3 evidence gathering for the generic-pattern performance work
(VERDICT r2 items 1-2).  Each probe is a chained-dependency loop (the
only trustworthy timing mode on the tunnelled chip — see
``benchmark_utils.measure_chained``) around ONE primitive of the random
SpMM pipeline, so the pipeline's cost model can be decomposed:

  stream         read (nnz, p) f32 at HBM stream speed (the ceiling)
  gather_csr     random B-row gather in CSR entry order (the fwd's core)
  gather_sorted  same rows, column-sorted order (monotone, x25 repeats)
  gather_unique  monotone near-dense gather (the "Bu" rank-stream)
  gather_bf16    random gather at half row bytes
  gather_p64     random gather at 256-byte rows (transaction effect)
  scalar_gather  p=1 value gather (the Krylov matvec's core)
  spmm_auto      current sparse_mm forward (pallas chunk path)
  spmm_xla       gather + sorted segment_sum forward
  seg_unsorted   unsorted scatter-add (the transpose/backward primitive)

Run on the real chip: ``python -m benchmarks.probe_random_gather``
(add ``--small`` for a CPU smoke run).  Prints one JSON line per probe.
"""

import argparse
import json
import sys
import time

import numpy as np


def chain(step, x0, rep=20, n_meas=4):
    import jax

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, rep, lambda i, y: step(y), x)

    t0 = time.perf_counter()
    r = many(x0)
    jax.block_until_ready(r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(leaf.ravel()[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(n_meas):
        t0 = time.perf_counter()
        r = many(x0)
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(leaf.ravel()[0])
        ts.append((time.perf_counter() - t0) / rep * 1e3)
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    n = 12_344 if args.small else 123_440
    nnz = 300_000 if args.small else 3_087_898
    p = 128
    print(f"backend={jax.default_backend()} n={n} nnz={nnz} p={p}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
    cols_in_row = rng.integers(0, n, nnz).astype(np.int32)  # CSR-ish order
    cols_sorted = np.sort(cols_in_row)
    uniq = np.unique(cols_sorted)

    key = jax.random.PRNGKey(0)
    B = jax.random.normal(key, (n, p), jnp.float32)
    Bh = B.astype(jnp.bfloat16)
    val = jax.random.normal(key, (nnz,), jnp.float32)
    x1 = jax.random.normal(key, (n,), jnp.float32)
    big = jax.random.normal(key, (nnz, p), jnp.float32)

    idx_csr = jnp.asarray(cols_in_row)
    idx_sort = jnp.asarray(cols_sorted)
    idx_uniq = jnp.asarray(uniq)
    rows_j = jnp.asarray(rows)

    eps = jnp.float32(1e-12)

    def dep(acc, s):
        return acc.at[(0,) * acc.ndim].add(
            (eps * s.astype(jnp.float32)).astype(acc.dtype))

    # --- stream ceiling ---
    ms, cs = chain(lambda a: dep(a, a.sum()), big)
    report("stream_read", ms, nnz * p * 4, f"compile {cs:.0f}s")

    # --- gathers (consumed by a fused sum; no HBM write of the result) ---
    for name, src, idx in [
        ("gather_csr", B, idx_csr),
        ("gather_sorted", B, idx_sort),
        ("gather_unique", B, idx_uniq),
        ("gather_bf16", Bh, idx_csr),
    ]:
        nb = idx.shape[0] * src.shape[1] * src.dtype.itemsize
        ms, cs = chain(lambda a, s=src, i=idx: dep(a, jnp.take(
            s + a[0, 0] * eps, i, axis=0).sum()), src)
        report(name, ms, nb, f"compile {cs:.0f}s")

    # 256-byte rows: does halving the row size halve throughput?
    B64 = B[:, :64]
    ms, cs = chain(lambda a: dep(a, jnp.take(a, idx_csr, axis=0).sum()),
                   B64)
    report("gather_p64", ms, nnz * 64 * 4, f"compile {cs:.0f}s")

    # --- p=1 scalar gathers (Krylov matvec core) ---
    ms, cs = chain(lambda a: dep(a, jnp.take(a, idx_csr).sum()), x1)
    report("scalar_gather", ms, nnz * 4, f"compile {cs:.0f}s")
    ms, cs = chain(lambda a: dep(a, jnp.take(a, idx_sort).sum()), x1)
    report("scalar_gather_sorted", ms, nnz * 4, f"compile {cs:.0f}s")

    # --- gather that must be materialized (feeds a pallas-like consumer):
    # write (nnz,p) out as well ---
    def mat_step(a):
        g = jnp.take(B + a[0, 0] * eps, idx_csr, axis=0)
        return a.at[0, 0].add(eps * g.sum()), g

    ms, cs = chain(lambda st: mat_step(st[0]), (B, big))
    report("gather_materialized", ms, nnz * p * 4 * 2,
           f"compile {cs:.0f}s; logical bytes = read+write")

    # --- full forwards ---
    from torchsparsegradutils_tpu import SparseCSR
    from torchsparsegradutils_tpu.solvers.common import as_matvec
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    np.cumsum(indptr, out=indptr)
    order = np.lexsort((cols_in_row, rows))
    A = SparseCSR(indptr.astype(np.int32),
                  cols_in_row[order], val, (n, n))

    from torchsparsegradutils_tpu import sparse_mm
    for backend in ("auto", "xla"):
        ms, cs = chain(
            lambda b, bk=backend: b + eps * sparse_mm(A, b, backend=bk), B)
        report(f"spmm_{backend}", ms, None, f"compile {cs:.0f}s")

    # SpMV p=1 (takes the XLA vector path today)
    mv = as_matvec(A)
    ms, cs = chain(lambda b: b + eps * mv(b), x1)
    report("spmv_auto_p1", ms, None, f"compile {cs:.0f}s")

    # --- unsorted scatter-add of rows (the AtG/backward primitive) ---
    ms, cs = chain(
        lambda a: dep(a, jax.ops.segment_sum(
            big * (1 + a[0, 0] * eps), rows_j, num_segments=n).sum()),
        B)
    report("seg_sorted_rows", ms, nnz * p * 4, f"compile {cs:.0f}s")
    ms, cs = chain(
        lambda a: dep(a, jax.ops.segment_sum(
            big * (1 + a[0, 0] * eps), idx_csr, num_segments=n).sum()),
        B)
    report("seg_unsorted_rows", ms, nnz * p * 4, f"compile {cs:.0f}s")


if __name__ == "__main__":
    main()
