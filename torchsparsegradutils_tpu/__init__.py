"""torchsparsegradutils_tpu — TPU-native sparse linear algebra with
sparsity-preserving gradients (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of ``cai4cai/torchsparsegradutils``
for TPU: sparse ops whose backward passes compute gradients **only at the
stored nonzeros** (one shared SDDMM primitive under ``jax.custom_vjp``),
Krylov solvers as ``lax.while_loop`` drivers, implicit-function-theorem
backwards for pluggable solvers, a sparse multivariate normal, and an nD
pairwise spatial encoder.
"""

from .types import SparseCOO, SparseCSC, SparseCSR, is_sparse
from .ops.spmm import sparse_mm, sddmm

__version__ = "0.1.0"

__all__ = [
    "SparseCOO",
    "SparseCSC",
    "SparseCSR",
    "is_sparse",
    "sparse_mm",
    "sddmm",
]


def __getattr__(name):  # lazy imports for heavier submodules
    if name in ("sparse_triangular_solve",):
        from .ops.triangular_solve import sparse_triangular_solve
        return sparse_triangular_solve
    if name in ("sparse_generic_solve",):
        from .ops.solve import sparse_generic_solve
        return sparse_generic_solve
    if name in ("sparse_generic_lstsq",):
        from .ops.lstsq import sparse_generic_lstsq
        return sparse_generic_lstsq
    if name in ("sparse_logsumexp", "sparse_bidir_logsumexp"):
        from .ops import logsumexp as _lse
        return getattr(_lse, name)
    if name in ("segment_mm", "gather_mm"):
        from .ops import indexed_matmul as _im
        return getattr(_im, name)
    if name == "dia_coverage":
        from .kernels.dia import dia_coverage
        return dia_coverage
    if name == "explain":
        from .kernels.explain import explain
        return explain
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
