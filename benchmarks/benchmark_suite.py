"""Run every benchmark suite back to back and render the plots
(reference benchmarks/benchmark_suite.py).

Run: ``python -m benchmarks.benchmark_suite [--small]``."""

from __future__ import annotations

import sys


def main(small: bool = False):
    from . import (batched_sparse_mm_rand, sparse_generic_solve_rand,
                   sparse_logsumexp_rand, sparse_logsumexp_suitesparse,
                   sparse_mm_rand, sparse_mm_suite, sparse_solve_suite,
                   sparse_triangular_solve_rand,
                   sparse_triangular_solve_suite, visualize_results)
    for mod in (sparse_mm_suite, sparse_solve_suite,
                sparse_triangular_solve_suite,
                sparse_logsumexp_suitesparse, sparse_mm_rand,
                batched_sparse_mm_rand,
                sparse_logsumexp_rand, sparse_generic_solve_rand,
                sparse_triangular_solve_rand):
        print(f"=== {mod.__name__} ===", flush=True)
        try:
            mod.main(small=small)
        except Exception as e:  # noqa: BLE001 - keep the sweep going
            print(f"{mod.__name__} failed: {e}", flush=True)
    visualize_results.main()


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
