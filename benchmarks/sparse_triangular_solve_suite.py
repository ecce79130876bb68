"""sparse_triangular_solve benchmark (reference
benchmarks/sparse_triangular_solve_suitesparse.py shape: cfd2-scale
lower-triangular system, M=2 RHS; reference GPU: fwd 23.8 ms /
bwd 48.7 ms).

Two matrices: the banded lower half of the cfd2-like stencil (DIA
rolling-window kernel) and a random lower-triangular pattern (blocked
``lax.scan`` path).  Chained-dependent timing.

Run: ``python -m benchmarks.sparse_triangular_solve_suite [--small]``."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu import sparse_triangular_solve
from torchsparsegradutils_tpu.utils import rand_sparse_tri
from torchsparsegradutils_tpu.utils.random_sparse import stencil_sparse

from .benchmark_utils import measure_chained, write_csv

LOWER_STENCIL = [-2500, -2499, -2451, -2450, -2449, -2401, -51, -50, -49,
                 -3, -2, -1, 0]


def main(small: bool = False):
    n, nnz, m = (4096, 20_000, 2) if small else (123_440, 3_087_898 // 2, 2)
    key = jax.random.PRNGKey(0)
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, m))
    eps = jnp.float32(1e-12)
    rows = []

    def run(A, pattern, algorithm, **kw):
        def fwd_step(b):
            return b + eps * sparse_triangular_solve(
                A, b, upper=False, algorithm=algorithm, **kw)

        tri_bytes = 4 * (A.nnz + 2 * n * m)   # vals + rhs read, x write
        r = measure_chained(fwd_step, B, rep=4, n_meas=4,
                            mem_fn=fwd_step, mem_args=(B,),
                            roofline_bytes=tri_bytes)
        rows.append(dict(op="tri_solve_fwd", pattern=pattern,
                         algorithm=algorithm,
                         block_size=kw.get("block_size", ""),
                         n=n, nnz=A.nnz, rhs=m, **r))
        grad = jax.grad(lambda d, b: (sparse_triangular_solve(
            A.with_data(d), b, upper=False, algorithm=algorithm,
            **kw) ** 2).sum())

        def bwd_step(d):
            return d + eps * grad(d, B)

        r = measure_chained(bwd_step, A.data, rep=4, n_meas=4,
                            mem_fn=bwd_step, mem_args=(A.data,),
                            roofline_bytes=3 * tri_bytes)
        rows.append(dict(op="tri_solve_fwd_bwd", pattern=pattern,
                         algorithm=algorithm,
                         block_size=kw.get("block_size", ""),
                         n=n, nnz=A.nnz, rhs=m, **r))
        print(rows[-2], rows[-1], sep="\n", flush=True)
        # incremental write: a timeout/crash mid-suite keeps prior rows
        write_csv("sparse_triangular_solve_results.csv", rows)

    offs = [-64, -9, -1, 0] if small else LOWER_STENCIL
    A_st = stencil_sparse(key, (n, n), offs, well_conditioned=True)
    run(A_st, "stencil", "dia")
    A_rd = rand_sparse_tri(key, (n, n), nnz, upper=False, layout="csr")
    run(A_rd, "random", "block", block_size=128)
    # nb=512 amortises the ~25 us/step sequential latency 4x (965 -> 242
    # steps at cfd2-factor scale); the library default for n >= 16384
    run(A_rd, "random", "block", block_size=512)
    run(A_rd, "random", "wave")   # level-scheduled wavefront (round 3)
    write_csv("sparse_triangular_solve_results.csv", rows)


if __name__ == "__main__":
    from benchmarks._jaxenv import reexec
    reexec()  # JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS (HTTP 413 fix)
    main(small="--small" in sys.argv)
