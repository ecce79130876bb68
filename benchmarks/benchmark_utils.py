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


def measure_chained(step: Callable, x0, rep: int = 8, n_meas: int = 5,
                    mem_fn: Optional[Callable] = None,
                    mem_args=None) -> Dict[str, float]:
    """Per-step time of ``rep`` *dependent* steps chained in one jit.

    ``step: x -> x`` (same pytree structure).  This is the trustworthy
    timing mode on the tunnelled TPU: pipelined independent dispatches
    overlap (flattering) and ``block_until_ready`` can return early for
    pure gather/stream programs (fake-fast); a data-dependent chain with
    a host read of the result has neither failure mode, and matches
    training-loop conditions.
    """
    try:
        @jax.jit
        def many(x):
            # fori_loop, not an unrolled chain: one traced copy of the
            # step, so compile time does not scale with rep
            return jax.lax.fori_loop(0, rep, lambda i, y: step(y), x)

        out = many(x0)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        times = []
        for _ in range(n_meas):
            t0 = time.perf_counter()
            out = many(x0)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.ravel()[0])
            times.append((time.perf_counter() - t0) * 1e6 / rep)
        mean_us, std_us = _trimmed(times)
        mem = (compiled_memory_mb(mem_fn, *mem_args)
               if mem_fn is not None else None)
        return {"time_us": round(mean_us, 1),
                "time_std_us": round(std_us, 1), "mem_MB": mem,
                "error": ""}
    except Exception as e:  # noqa: BLE001 - record and continue the sweep
        return {"time_us": float("nan"), "time_std_us": float("nan"),
                "mem_MB": float("nan"),
                "error": f"{type(e).__name__}: {str(e)[:200]}"}


def write_csv(name: str, rows) -> str:
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, name)
    env = env_info()
    rows = [dict(r, **env) for r in rows]
    keys = list(rows[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {path} ({len(rows)} rows)")
    return path
