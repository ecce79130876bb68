from .bicgstab import BICGSTABSettings, bicgstab
from .cg import LinearCGSettings, linear_cg
from .common import SolveInfo
from .lsmr import LSMRSettings, lsmr
from .minres import MINRESSettings, minres

__all__ = [
    "BICGSTABSettings",
    "bicgstab",
    "LinearCGSettings",
    "linear_cg",
    "LSMRSettings",
    "lsmr",
    "MINRESSettings",
    "minres",
    "SolveInfo",
]
