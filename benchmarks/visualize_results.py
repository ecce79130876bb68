"""Render benchmark result CSVs into comparison plots (reference
``benchmarks/visualize_benchmark_results.py``).

Reads every ``results/*.csv`` it understands and writes PNGs under
``results/``:

* per-suite grouped bars (pattern x backend/algorithm, fwd vs bwd);
* a reference-comparison chart against the published RTX 4090/5090
  numbers (BASELINE.md) at cfd2 scale;
* log-log scaling curves for the random-size sweeps.

Failed rows (NaN timings, recorded errors) are drawn as hatched
placeholders with the error class, mirroring the reference's
OOM-annotation style.

Run: ``python -m benchmarks.visualize_results``.
"""

from __future__ import annotations

import csv
import math
import os
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from .benchmark_utils import RESULTS_DIR  # noqa: E402

# Published reference numbers (BASELINE.md; RTX 4090 unless noted).
REFERENCE_MS = {
    "sparse_mm fwd": 0.722,
    "sparse_mm fwd+bwd": 73.8,
    "cg fwd": 105.0,
    "cg bwd": 208.0,
    "minres fwd": 99.0,
    "bicgstab fwd": 162.0,
    "tri fwd": 23.8,
    "tri fwd+bwd": 72.5,
    "logsumexp fwd": 0.419,          # RTX 5090
}

PALETTE = {
    "stencil": "#2d6a4f",
    "random": "#9d4f2d",
    "reference": "#777777",
}


def _read(name):
    path = os.path.join(RESULTS_DIR, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return list(csv.DictReader(f))


def _ms(row):
    try:
        v = float(row["time_us"]) / 1e3
        return v if math.isfinite(v) else None
    except (KeyError, ValueError):
        return None


def _err_class(row):
    e = (row.get("error") or "").strip()
    return e.split(":")[0] if e else ""


def _save(fig, name):
    out = os.path.join(RESULTS_DIR, name)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print("wrote", out)


def _grouped_bars(ax, groups, series, values, errors, ylabel="time (ms)",
                  log=False):
    """groups: x categories; series: legend entries; values[s][g] -> ms or
    None (failed -> hatched stub annotated with errors[s][g])."""
    n_g, n_s = len(groups), len(series)
    width = 0.8 / max(n_s, 1)
    colors = plt.cm.tab10.colors
    finite = [v for vs in values.values() for v in vs.values()
              if v is not None]
    stub = (min(finite) if finite else 1.0) * 0.5
    for si, s in enumerate(series):
        xs, hs, cs, hatches = [], [], [], []
        for gi, g in enumerate(groups):
            v = values.get(s, {}).get(g)
            xs.append(gi + (si - (n_s - 1) / 2) * width)
            hs.append(v if v is not None else stub)
            cs.append(PALETTE.get(s, colors[si % len(colors)]))
            hatches.append("" if v is not None else "//")
        bars = ax.bar(xs, hs, width=width * 0.9, color=cs, label=s)
        for b, h, g, hatch in zip(bars, hs, groups, hatches):
            b.set_hatch(hatch)
            note = (f"{h:.2f}" if not hatch else
                    errors.get(s, {}).get(g, "err") or "err")
            ax.text(b.get_x() + b.get_width() / 2, h, note, ha="center",
                    va="bottom", fontsize=6.5,
                    rotation=90 if hatch else 0)
    ax.set_xticks(range(n_g))
    ax.set_xticklabels(groups, rotation=25, ha="right", fontsize=8)
    ax.set_ylabel(ylabel)
    if log:
        ax.set_yscale("log")
    ax.legend(fontsize=8)


def plot_sparse_mm():
    rows = _read("sparse_mm_suite_results.csv")
    if not rows:
        return
    ops = ["sparse_mm_fwd", "sparse_mm_fwd_bwd", "sparse_mm_bwd"]
    groups, values, errors = [], defaultdict(dict), defaultdict(dict)
    for r in rows:
        if r["op"] not in ops:
            continue
        g = (f"{r['op'].replace('sparse_mm_', '')}\n"
             f"{r.get('layout', '')}/{r.get('backend', '')}")
        s = r.get("pattern", "random")
        if g not in groups:
            groups.append(g)
        values[s][g] = _ms(r)
        errors[s][g] = _err_class(r)
    fig, ax = plt.subplots(figsize=(11, 4.5))
    _grouped_bars(ax, groups, sorted(values), values, errors, log=True)
    ax.axhline(REFERENCE_MS["sparse_mm fwd"], color=PALETTE["reference"],
               ls="--", lw=1)
    ax.axhline(REFERENCE_MS["sparse_mm fwd+bwd"],
               color=PALETTE["reference"], ls=":", lw=1)
    ax.text(len(groups) - 0.5, REFERENCE_MS["sparse_mm fwd"],
            "ref fwd (RTX 4090)", fontsize=7, va="bottom", ha="right")
    ax.text(len(groups) - 0.5, REFERENCE_MS["sparse_mm fwd+bwd"],
            "ref fwd+bwd", fontsize=7, va="bottom", ha="right")
    ax.set_title(f"sparse_mm @ cfd2 scale (n={rows[0]['n']})", fontsize=10)
    _save(fig, "sparse_mm_suite.png")


def plot_solve():
    rows = _read("sparse_generic_solve_suite_results.csv")
    if not rows:
        return
    groups, values, errors = [], defaultdict(dict), defaultdict(dict)
    for r in rows:
        g = f"{r['algorithm']}\n{r['op'].replace('solve_', '')}"
        s = r.get("matrix", "random")
        if g not in groups:
            groups.append(g)
        values[s][g] = _ms(r)
        errors[s][g] = _err_class(r)
    fig, ax = plt.subplots(figsize=(10, 4.5))
    _grouped_bars(ax, groups, sorted(values), values, errors, log=True)
    for key, label in [("cg fwd", "ref CG fwd"), ("cg bwd", "ref CG bwd")]:
        ax.axhline(REFERENCE_MS[key], color=PALETTE["reference"], ls="--",
                   lw=1)
        ax.text(0.1, REFERENCE_MS[key], label, fontsize=7, va="bottom")
    ax.set_title("sparse_generic_solve @ cfd2 scale vs reference GPU",
                 fontsize=10)
    _save(fig, "sparse_generic_solve_suite.png")


def plot_triangular():
    rows = _read("sparse_triangular_solve_results.csv")
    if not rows:
        return
    groups, values, errors = [], defaultdict(dict), defaultdict(dict)
    for r in rows:
        alg = r.get("algorithm") or f"bs={r.get('block_size', '?')}"
        g = f"{r['op'].replace('tri_solve_', '')}\n{alg}"
        s = r.get("pattern", "random")
        if g not in groups:
            groups.append(g)
        values[s][g] = _ms(r)
        errors[s][g] = _err_class(r)
    fig, ax = plt.subplots(figsize=(8, 4.2))
    _grouped_bars(ax, groups, sorted(values), values, errors)
    ax.axhline(REFERENCE_MS["tri fwd"], color=PALETTE["reference"],
               ls="--", lw=1)
    ax.text(0.1, REFERENCE_MS["tri fwd"], "ref fwd (RTX 4090)",
            fontsize=7, va="bottom")
    ax.set_title(f"sparse_triangular_solve (n={rows[0]['n']}, M=2)",
                 fontsize=10)
    _save(fig, "sparse_triangular_solve.png")


def plot_logsumexp_suitesparse():
    rows = _read("sparse_logsumexp_suitesparse_results.csv")
    if not rows:
        return
    groups, values, errors = [], defaultdict(dict), defaultdict(dict)
    for r in rows:
        g = r["op"].replace("_fwd", "").replace("_", "\n")
        s = r.get("pattern", "random")
        if g not in groups:
            groups.append(g)
        values[s][g] = _ms(r)
        errors[s][g] = _err_class(r)
    fig, ax = plt.subplots(figsize=(8, 4.2))
    _grouped_bars(ax, groups, sorted(values), values, errors)
    ax.axhline(REFERENCE_MS["logsumexp fwd"], color=PALETTE["reference"],
               ls="--", lw=1)
    ax.text(0.1, REFERENCE_MS["logsumexp fwd"], "ref fwd (RTX 5090)",
            fontsize=7, va="bottom")
    ax.set_title("sparse_logsumexp / bidir @ cfd2 scale", fontsize=10)
    _save(fig, "sparse_logsumexp_suitesparse.png")


def plot_scaling(name, csv_name, title):
    rows = _read(csv_name)
    if not rows:
        return
    series = defaultdict(list)
    for r in rows:
        v = _ms(r)
        if v is None:
            continue
        key = "/".join(filter(None, [r.get("op", ""), r.get("backend", "")]))
        series[key].append((int(r["nnz"]), v))
    if not series:
        return
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for key, pts in sorted(series.items()):
        pts.sort()
        ax.plot([p[0] for p in pts], [p[1] for p in pts], "o-", label=key,
                lw=1.2, ms=4)
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("nnz")
    ax.set_ylabel("time (ms)")
    ax.set_title(title, fontsize=10)
    ax.legend(fontsize=7)
    _save(fig, name)


def plot_vs_reference_summary():
    """One chart: our best cfd2-scale numbers against the reference GPU."""
    ours = {}
    mm = _read("sparse_mm_suite_results.csv") or []
    for r in mm:
        if r.get("pattern") == "stencil" and r.get("backend") in ("dia",):
            if r["op"] == "sparse_mm_fwd":
                ours["sparse_mm fwd"] = _ms(r)
            if r["op"] == "sparse_mm_fwd_bwd":
                ours["sparse_mm fwd+bwd"] = _ms(r)
    sv = _read("sparse_generic_solve_suite_results.csv") or []
    for r in sv:
        if r.get("matrix", "").startswith("stencil"):
            key = f"{r['algorithm']} {r['op'].replace('solve_', '')}"
            if key in REFERENCE_MS:
                ours[key] = _ms(r)
    tri = _read("sparse_triangular_solve_results.csv") or []
    for r in tri:
        if r.get("pattern") == "stencil":
            if r["op"] == "tri_solve_fwd":
                ours["tri fwd"] = _ms(r)
            if r["op"] == "tri_solve_fwd_bwd":
                ours["tri fwd+bwd"] = _ms(r)
    lse = _read("sparse_logsumexp_suitesparse_results.csv") or []
    for r in lse:
        if r.get("pattern") == "stencil" and r["op"] == "lse_dim1_fwd":
            ours["logsumexp fwd"] = _ms(r)
    keys = [k for k in REFERENCE_MS if ours.get(k) is not None]
    if not keys:
        return
    fig, ax = plt.subplots(figsize=(9, 4.5))
    xs = range(len(keys))
    ax.bar([x - 0.2 for x in xs], [REFERENCE_MS[k] for k in keys],
           width=0.38, color=PALETTE["reference"],
           label="reference GPU (published)")
    ax.bar([x + 0.2 for x in xs], [ours[k] for k in keys], width=0.38,
           color=PALETTE["stencil"], label="this library (v5e, stencil)")
    for x, k in zip(xs, keys):
        speed = REFERENCE_MS[k] / ours[k]
        ax.text(x + 0.2, ours[k], f"{speed:.1f}x", ha="center",
                va="bottom", fontsize=8)
    ax.set_yscale("log")
    ax.set_xticks(list(xs))
    ax.set_xticklabels(keys, rotation=25, ha="right", fontsize=8)
    ax.set_ylabel("time (ms), log scale")
    ax.set_title("cfd2-scale: published reference GPU vs one TPU v5e",
                 fontsize=10)
    ax.legend(fontsize=8)
    _save(fig, "vs_reference_summary.png")


SUITE_CSVS = [
    "sparse_mm_suite_results.csv",
    "sparse_generic_solve_suite_results.csv",
    "sparse_triangular_solve_results.csv",
    "sparse_logsumexp_suitesparse_results.csv",
    "sparse_mm_rand_results.csv",
    "sparse_logsumexp_rand_results.csv",
    "batched_sparse_mm_rand_results.csv",
    "sparse_triangular_solve_rand_results.csv",
    "sparse_generic_solve_rand_results.csv",
]

_TABLE_COLS = ["op", "pattern", "matrix", "algorithm", "layout", "backend",
               "n", "nnz", "rhs", "time_us", "time_std_us", "mem_MB",
               "roofline_pct", "rel_residual", "error"]


def render_results_tables():
    """Write results/SUMMARY.md: one readable table per suite CSV, with
    environment provenance — the reference's rendered result tables
    (visualize_benchmark_results.py table panels), as markdown."""
    out = [
        "# Benchmark results summary",
        "",
        "Auto-generated by `python -m benchmarks.visualize_results` from",
        "the CSVs in this directory.  Failed rows keep their error class",
        "(the reference's OOM-annotation convention).",
        "",
    ]
    for name in SUITE_CSVS:
        rows = _read(name)
        if not rows:
            continue
        env = rows[0].get("device", "") or rows[0].get("backend_env", "")
        jaxv = rows[0].get("jax", "")
        cols = [c for c in _TABLE_COLS
                if any((r.get(c) or "") != "" for r in rows)]
        out.append(f"## {name}")
        if env or jaxv:
            out.append(f"*device: {env or '?'}; jax {jaxv or '?'}*")
        out.append("")
        out.append("| " + " | ".join(cols) + " |")
        out.append("|" + "---|" * len(cols))
        for r in rows:
            cells = []
            for c in cols:
                v = (r.get(c) or "").strip()
                if c == "error" and v:
                    v = v.split(":")[0]
                cells.append(v if v else "—")
            out.append("| " + " | ".join(cells) + " |")
        out.append("")
    path = os.path.join(RESULTS_DIR, "SUMMARY.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote", path)


def plot_memory():
    """Peak compiled memory per op where recorded, against the
    reference's backward peaks (5.11 GB sparse bwd; 58.1 GB dense OOM)."""
    bars = []
    for name in SUITE_CSVS:
        for r in _read(name) or []:
            try:
                mem = float(r.get("mem_MB") or "nan")
            except ValueError:
                continue
            if not math.isfinite(mem) or mem <= 0:
                continue
            label = "/".join(filter(None, [
                r.get("op", ""), r.get("pattern", r.get("matrix", "")),
                r.get("backend", r.get("algorithm", ""))]))
            bars.append((label, mem))
    if not bars:
        return
    bars = bars[:24]
    fig, ax = plt.subplots(figsize=(11, 4.5))
    ax.bar(range(len(bars)), [b[1] for b in bars],
           color=PALETTE["stencil"])
    ax.axhline(5110, color=PALETTE["reference"], ls="--", lw=1)
    ax.text(0.1, 5110, "ref sparse bwd peak (5.11 GB)", fontsize=7,
            va="bottom")
    ax.axhline(58132, color="#aa3333", ls=":", lw=1)
    ax.text(0.1, 58132, "ref dense-grad OOM request (58.1 GB)", fontsize=7,
            va="bottom")
    ax.set_yscale("log")
    ax.set_xticks(range(len(bars)))
    ax.set_xticklabels([b[0] for b in bars], rotation=35, ha="right",
                       fontsize=6.5)
    ax.set_ylabel("compiled temp+output MB (log)")
    ax.set_title("peak compiled memory per op (XLA memory analysis)",
                 fontsize=10)
    _save(fig, "memory_per_op.png")


def plot_roofline():
    """% of HBM roofline achieved, where a bytes-moved model exists."""
    bars = []
    for name in SUITE_CSVS:
        for r in _read(name) or []:
            try:
                pct = float(r.get("roofline_pct") or "nan")
            except ValueError:
                continue
            if not math.isfinite(pct) or pct <= 0:
                continue
            label = "/".join(filter(None, [
                r.get("op", ""), r.get("pattern", ""),
                r.get("backend", r.get("algorithm", "")),
                r.get("scale", "")]))
            bars.append((label, pct))
    if not bars:
        return
    fig, ax = plt.subplots(figsize=(11, 4.2))
    ax.bar(range(len(bars)), [b[1] for b in bars],
           color=PALETTE["stencil"])
    ax.axhline(70, color="#aa3333", ls="--", lw=1)
    ax.text(0.1, 70, "BASELINE.md target (70%)", fontsize=7, va="bottom")
    ax.set_xticks(range(len(bars)))
    ax.set_xticklabels([b[0] for b in bars], rotation=35, ha="right",
                       fontsize=6.5)
    ax.set_ylabel("% of HBM roofline")
    ax.set_title("bytes-moved model / measured time vs v5e HBM peak",
                 fontsize=10)
    _save(fig, "roofline_per_op.png")


def main():
    plot_sparse_mm()
    plot_solve()
    plot_triangular()
    plot_logsumexp_suitesparse()
    plot_scaling("sparse_mm_rand_scaling.png", "sparse_mm_rand_results.csv",
                 "sparse_mm over random sizes")
    plot_scaling("sparse_logsumexp_rand_scaling.png",
                 "sparse_logsumexp_rand_results.csv",
                 "sparse_logsumexp over random sizes")
    plot_vs_reference_summary()
    plot_memory()
    plot_roofline()
    render_results_tables()


if __name__ == "__main__":
    main()
