from .structure import (
    coalesce,
    coo_to_csr,
    coo_to_csr_indices_values,
    csr_to_coo,
    csr_transpose,
    sparse_block_diag,
    sparse_block_diag_split,
    sparse_eye,
    sparse_stack,
)
from .random_sparse import make_spd_sparse, rand_sparse, rand_sparse_tri

__all__ = [
    "coalesce",
    "coo_to_csr",
    "coo_to_csr_indices_values",
    "csr_to_coo",
    "csr_transpose",
    "sparse_block_diag",
    "sparse_block_diag_split",
    "sparse_eye",
    "sparse_stack",
    "make_spd_sparse",
    "rand_sparse",
    "rand_sparse_tri",
]
