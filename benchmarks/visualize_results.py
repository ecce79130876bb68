"""Plot benchmark result CSVs into PNGs (reference
benchmarks/visualize_benchmark_results.py).

Reads every ``results/*.csv`` it understands and writes one grouped-bar PNG
per suite under ``results/``.  Run: ``python -m benchmarks.visualize_results``.
"""

from __future__ import annotations

import csv
import math
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from .benchmark_utils import RESULTS_DIR  # noqa: E402


def _read(name):
    path = os.path.join(RESULTS_DIR, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return list(csv.DictReader(f))


def _bar(ax, labels, values, title, ylabel="time (ms)"):
    xs = range(len(labels))
    ax.bar(xs, values, color="#4878a8")
    ax.set_xticks(list(xs))
    ax.set_xticklabels(labels, rotation=30, ha="right", fontsize=8)
    ax.set_title(title, fontsize=10)
    ax.set_ylabel(ylabel)
    for x, v in zip(xs, values):
        if math.isfinite(v):
            ax.text(x, v, f"{v:.1f}", ha="center", va="bottom", fontsize=7)


def plot_sparse_mm():
    rows = _read("sparse_mm_suite_results.csv")
    if not rows:
        return
    fig, ax = plt.subplots(figsize=(9, 4))
    labels, values = [], []
    for r in rows:
        labels.append(f"{r['op'].replace('sparse_mm_', '')}\n"
                      f"{r['layout']}/{r['backend']}")
        values.append(float(r["time_us"]) / 1e3)
    _bar(ax, labels, values,
         f"sparse_mm @ cfd2 scale (n={rows[0]['n']}, nnz={rows[0]['nnz']})")
    fig.tight_layout()
    out = os.path.join(RESULTS_DIR, "sparse_mm_suite.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)


def plot_solve():
    rows = _read("sparse_generic_solve_suite_results.csv")
    if not rows:
        return
    fig, ax = plt.subplots(figsize=(8, 4))
    labels = [f"{r['op'].replace('solve_', '')}\n{r['algorithm']}"
              for r in rows]
    values = [float(r["time_us"]) / 1e3 for r in rows]
    _bar(ax, labels, values,
         f"sparse_generic_solve (n={rows[0]['n']}, nnz={rows[0]['nnz']})")
    fig.tight_layout()
    out = os.path.join(RESULTS_DIR, "sparse_generic_solve_suite.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)


def plot_logsumexp():
    rows = _read("sparse_logsumexp_rand_results.csv")
    if not rows:
        return
    fig, ax = plt.subplots(figsize=(9, 4))
    labels = [f"{r['op']}\nn=2^{int(math.log2(int(r['n'])))}"
              for r in rows]
    values = [float(r["time_us"]) / 1e3 for r in rows]
    _bar(ax, labels, values, "sparse_logsumexp / bidir over random sizes")
    fig.tight_layout()
    out = os.path.join(RESULTS_DIR, "sparse_logsumexp_rand.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)


def plot_triangular():
    rows = _read("sparse_triangular_solve_results.csv")
    if not rows:
        return
    fig, ax = plt.subplots(figsize=(7, 4))
    labels = [f"{r['op'].replace('tri_solve_', '')}\nbs={r['block_size']}"
              for r in rows]
    values = [float(r["time_us"]) / 1e3 for r in rows]
    _bar(ax, labels, values,
         f"sparse_triangular_solve (n={rows[0]['n']}, "
         f"nnz={rows[0]['nnz']})")
    fig.tight_layout()
    out = os.path.join(RESULTS_DIR, "sparse_triangular_solve.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)


def main():
    plot_sparse_mm()
    plot_solve()
    plot_logsumexp()
    plot_triangular()


if __name__ == "__main__":
    main()
