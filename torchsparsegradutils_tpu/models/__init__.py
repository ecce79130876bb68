from .distributions import (
    SparseMultivariateNormal,
    SparseMultivariateNormalNative,
)

__all__ = [
    "SparseMultivariateNormal",
    "SparseMultivariateNormalNative",
]


def __getattr__(name):
    if name in ("PairwiseEncoder", "calc_pairwise_coo_indices_nd"):
        from . import encoders
        return getattr(encoders, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
