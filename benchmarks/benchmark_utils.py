"""Benchmark harness: timing, memory estimates, CSV output, provenance.

Rebuild of the reference's harness
(``/root/reference/torchsparsegradutils/benchmarks/benchmark_utils.py``):
``measure_op`` (:123-292) with warmups, synced wall-clock, IQR outlier
removal (:156-165), OOM capture (:103-120 → NaN rows, :222-226), and
environment provenance stamped into every CSV row (:37-56, :357-404).

TPU adaptations: synchronisation is ``jax.block_until_ready`` with a
pipelined steady-state mode (per-call host dispatch on a tunnelled chip is
~10 ms); "peak memory" is XLA's compiled memory analysis
(argument/output/temporary bytes) — the compile-time equivalent of
``torch.cuda.max_memory_allocated``."""

from __future__ import annotations

import csv
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def env_info() -> Dict[str, str]:
    dev = jax.devices()[0]
    return {
        "jax_version": jax.__version__,
        "jax_backend": jax.default_backend(),
        "device": str(dev.device_kind),
        "platform": dev.platform,
    }


def _trimmed(xs):
    xs = np.sort(np.asarray(xs))
    q1, q3 = np.percentile(xs, [25, 75])
    iqr = q3 - q1
    keep = xs[(xs >= q1 - 1.5 * iqr) & (xs <= q3 + 1.5 * iqr)]
    return float(keep.mean()), float(keep.std())


def compiled_memory_mb(fn: Callable, *args) -> Optional[float]:
    """Temp + output bytes of the compiled program (XLA memory analysis)."""
    try:
        ma = jax.jit(fn).lower(*args).compile().memory_analysis()
        total = (getattr(ma, "temp_size_in_bytes", 0)
                 + getattr(ma, "output_size_in_bytes", 0))
        return round(total / 1e6, 2)
    except Exception:
        return None


def measure_op(fn: Callable, args, n_warmup: int = 3, n_runs: int = 20,
               pipeline: int = 5, with_memory: bool = True
               ) -> Dict[str, float]:
    """Compile + time ``fn(*args)``; returns mean/std µs and memory MB.
    OOM or other failures return NaN timings with the error recorded."""
    jfn = jax.jit(fn)
    try:
        out = jfn(*args)
        jax.block_until_ready(out)
        for _ in range(n_warmup):
            jax.block_until_ready(jfn(*args))
        times = []
        for _ in range(max(n_runs // pipeline, 2)):
            t0 = time.perf_counter()
            outs = [jfn(*args) for _ in range(pipeline)]
            jax.block_until_ready(outs)
            # force a real host sync with a scalar-sized transfer (a full
            # array pull over the tunnel costs tens of ms and adds noise)
            leaf = jax.tree_util.tree_leaves(outs[-1])[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            times.append((time.perf_counter() - t0) * 1e6 / pipeline)
        mean_us, std_us = _trimmed(times)
        mem = compiled_memory_mb(fn, *args) if with_memory else None
        return {"time_us": round(mean_us, 1), "time_std_us": round(std_us, 1),
                "mem_MB": mem, "error": ""}
    except Exception as e:  # noqa: BLE001 - record and continue the sweep
        return {"time_us": float("nan"), "time_std_us": float("nan"),
                "mem_MB": float("nan"),
                "error": f"{type(e).__name__}: {str(e)[:200]}"}


HBM_PEAK_GBPS = 819.0  # one v5e chip (v5p: 2765); roofline_pct denominator


def roofline_pct(bytes_moved: Optional[float],
                 time_us: float) -> Optional[float]:
    """% of HBM-bandwidth roofline achieved, from a bytes-moved model
    (nnz/shape-derived minimum traffic) and a measured time."""
    if not bytes_moved or not time_us or time_us != time_us:
        return None
    return round(bytes_moved / (time_us * 1e-6) / (HBM_PEAK_GBPS * 1e9)
                 * 100.0, 1)


def chain_diff(step: Callable, x0, rep: int = 20, n_meas: int = 4,
               prepare: Optional[Callable] = None, prep_args=()):
    """Probe-grade differenced chain: returns (median ms/step, compile s).

    Same differencing as :func:`measure_chained` (2*rep chain minus rep
    chain cancels the fixed ~30 ms per-dispatch tunnel cost) in a plain
    tuple shape for the micro-probe scripts.

    ``prepare(*prep_args) -> step`` threads operand values as TRACED
    ARGUMENTS instead of closure constants.  Use it whenever the step
    would close over a concrete array of MBs: a captured 12 MB value
    grid tripled the remote compile time of the identical kernel
    (measured 1045 s vs 356 s — the round-4 "20-minute compile" gap)."""
    @jax.jit
    def many_r(x, r, *pa):
        s = step if prepare is None else prepare(*pa)
        # traced trip count: ONE compiled program serves both the rep and
        # 2*rep chains (halves the dominant cost on the remote-compile
        # TPU, and the differenced pair runs the identical executable)
        return jax.lax.fori_loop(0, r, lambda i, y: s(y), x)

    def bind(r):
        rr = jnp.int32(r)
        return lambda x: many_r(x, rr, *prep_args)

    many1, many2 = bind(rep), bind(2 * rep)
    t0 = time.perf_counter()
    for many in (many1, many2):
        out = many(x0)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.ravel()[0])
    compile_s = time.perf_counter() - t0

    def timed(many):
        t1 = time.perf_counter()
        out = many(x0)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.ravel()[0])
        return time.perf_counter() - t1

    ts = []
    for _ in range(n_meas):
        t1 = timed(many1)
        t2 = timed(many2)
        ts.append(max(t2 - t1, 0.0) / rep * 1e3)
    return float(np.median(ts)), compile_s


def measure_chained(step: Callable, x0, rep: int = 8, n_meas: int = 5,
                    mem_fn: Optional[Callable] = None,
                    mem_args=None,
                    roofline_bytes: Optional[float] = None,
                    prepare: Optional[Callable] = None,
                    prep_args=()
                    ) -> Dict[str, float]:
    """Per-step time of ``rep`` *dependent* steps chained in one jit.

    ``step: x -> x`` (same pytree structure).  This is the trustworthy
    timing mode on the tunnelled TPU: pipelined independent dispatches
    overlap (flattering) and ``block_until_ready`` can return early for
    pure gather/stream programs (fake-fast); a data-dependent chain with
    a host read of the result has neither failure mode, and matches
    training-loop conditions.

    The per-step time is the DIFFERENCE between a 2*rep-step chain and a
    rep-step chain, which cancels the fixed per-dispatch cost exactly —
    measured ~30 ms per call on the tunnelled v5e (dispatch + readback),
    which at rep=8 would masquerade as ~4 ms/step of kernel time (a
    trivial ``d + eps*d[0]`` step "measures" 3.7 ms at rep=8 and 0.47 ms
    at rep=80; the differenced estimate is ~0.1 ms at both).

    ``prepare(*prep_args) -> step`` (optional) builds the step INSIDE
    the jit before the loop, so operator values enter as traced
    arguments instead of closure constants — XLA constant-folding of
    plan-derived tensors from a concrete operator can exceed the 2 GiB
    TPU executable-proto limit (hybrid patterns at cfd2 scale).  The
    per-chain setup still sits outside the fori_loop and cancels in the
    differencing.
    """
    try:
        @jax.jit
        def many_r(x, r, *pa):
            s = step if prepare is None else prepare(*pa)
            # fori_loop with a *traced* trip count: one traced copy of
            # the step AND one compiled program for both the rep and
            # 2*rep chains (remote compiles dominate suite wall-clock;
            # the differenced pair also runs the identical executable)
            return jax.lax.fori_loop(0, r, lambda i, y: s(y), x)

        def chain(r):
            rr = jnp.int32(r)
            return lambda x, *pa: many_r(x, rr, *pa)

        many1 = chain(rep)
        many2 = chain(2 * rep)

        def timed(many):
            t0 = time.perf_counter()
            out = many(x0, *prep_args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.ravel()[0])
            return (time.perf_counter() - t0) * 1e6

        for many in (many1, many2):    # warm the compile caches
            out = many(x0, *prep_args)
            jax.block_until_ready(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.ravel()[0])
        times = []
        for _ in range(n_meas):
            t1 = timed(many1)
            t2 = timed(many2)
            times.append(max(t2 - t1, 0.0) / rep)
        mean_us, std_us = _trimmed(times)
        mem = (compiled_memory_mb(mem_fn, *mem_args)
               if mem_fn is not None else None)
        return {"time_us": round(mean_us, 1),
                "time_std_us": round(std_us, 1), "mem_MB": mem,
                "roofline_pct": roofline_pct(roofline_bytes, mean_us),
                "error": ""}
    except Exception as e:  # noqa: BLE001 - record and continue the sweep
        return {"time_us": float("nan"), "time_std_us": float("nan"),
                "mem_MB": float("nan"), "roofline_pct": None,
                "error": f"{type(e).__name__}: {str(e)[:200]}"}


def write_csv(name: str, rows, merge: bool = False) -> str:
    """Write rows (+ env provenance).  ``merge=True`` upserts into an
    existing CSV instead of replacing it — selective re-runs (e.g.
    ``sparse_mm_suite --only hybrid70``) update their rows in place,
    keyed on the identifying (non-measurement) columns."""
    os.makedirs(RESULTS_DIR, exist_ok=True)
    # CPU smoke runs must not clobber committed real-chip results
    if jax.default_backend() not in ("tpu", "axon"):
        name = name.replace(".csv", ".cpu-smoke.csv")
    path = os.path.join(RESULTS_DIR, name)
    env = env_info()
    rows = [dict(r, **env) for r in rows]
    if merge and os.path.exists(path):
        meas = {"time_us", "time_std_us", "mem_MB", "roofline_pct",
                "error", *env.keys()}

        def key(r):
            return tuple(sorted((k, str(v)) for k, v in r.items()
                                if k not in meas))

        with open(path, newline="") as f:
            old = list(csv.DictReader(f))
        new_keys = {key(r) for r in rows}
        rows = [r for r in old if key(r) not in new_keys] + rows
    keys = list(rows[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {path} ({len(rows)} rows)")
    return path


DATA_DIR = os.path.join(os.path.dirname(__file__), ".benchmark_data")
SUITESPARSE_URL = "https://suitesparse-collection-website.herokuapp.com/MM"


def get_suitesparse(group: str, name: str, layout: str = "csr"):
    """Download (and cache) a SuiteSparse matrix as a sparse container.

    Mirror of the reference's loader (benchmarks/benchmark_utils.py:
    59-100): fetches ``<group>/<name>.tar.gz`` from the SuiteSparse
    Matrix Market mirror into ``benchmarks/.benchmark_data`` and parses
    the ``.mtx``.  In network-less environments, drop the extracted
    ``<name>.mtx`` into the cache directory by hand and this function
    picks it up.
    """
    import tarfile
    import urllib.request

    import jax.numpy as jnp
    import scipy.io as sio

    from torchsparsegradutils_tpu.types import SparseCOO

    os.makedirs(DATA_DIR, exist_ok=True)
    mtx_path = os.path.join(DATA_DIR, f"{name}.mtx")
    if not os.path.exists(mtx_path):
        tar_path = os.path.join(DATA_DIR, f"{name}.tar.gz")
        if not os.path.exists(tar_path):
            url = f"{SUITESPARSE_URL}/{group}/{name}.tar.gz"
            print(f"downloading {url} ...")
            urllib.request.urlretrieve(url, tar_path)
        with tarfile.open(tar_path) as tf:
            for member in tf.getmembers():
                if member.name.endswith(f"{name}.mtx"):
                    member.name = os.path.basename(member.name)
                    tf.extract(member, DATA_DIR)
                    break
    M = sio.mmread(mtx_path).tocoo()
    order = np.lexsort((M.col, M.row))
    coo = SparseCOO(M.row[order].astype(np.int32),
                    M.col[order].astype(np.int32),
                    jnp.asarray(M.data[order], jnp.float32), M.shape)
    return coo if layout == "coo" else coo.tocsr()


def cfd2_or_stencil(key, layout: str = "csr", lower_half: bool = False,
                    spd: bool = False):
    """(matrix, label): the real Rothberg/cfd2 when downloadable/cached,
    else the cfd2-faithful 25-diagonal stencil (no-egress environments)."""
    import jax.numpy as jnp

    try:
        A = get_suitesparse("Rothberg", "cfd2", layout="coo")
        if lower_half:
            import numpy as _np

            from torchsparsegradutils_tpu.types import SparseCOO
            r, c = A.rows_np(), A.cols_np()
            keep = c <= r
            A = SparseCOO(r[keep], c[keep],
                          A.data[jnp.asarray(_np.nonzero(keep)[0])],
                          A.shape)
        if layout == "csr":
            A = A.tocsr()
        return A, "cfd2"
    except Exception:
        from torchsparsegradutils_tpu.utils.random_sparse import (
            make_spd_stencil, stencil_sparse)
        offs = sorted({0, 1, -1, 2, -2, 3, -3, 49, -49, 50, -50, 51, -51,
                       2401, -2401, 2449, -2449, 2450, -2450, 2451, -2451,
                       2499, -2499, 2500, -2500})
        if spd:
            return make_spd_stencil(key, 123_440,
                                    [o for o in offs if o > 0],
                                    layout=layout), "stencil_cfd2"
        if lower_half:
            offs = [o for o in offs if o <= 0]
        return stencil_sparse(key, (123_440, 123_440), offs,
                              layout=layout), "stencil_cfd2"
