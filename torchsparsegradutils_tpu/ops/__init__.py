from .spmm import sparse_mm, sddmm

__all__ = ["sparse_mm", "sddmm"]
