from .jax_sparse import from_bcoo, from_bcsr, have_jax_sparse, to_bcoo, to_bcsr
from .scipy_solve import have_scipy, scipy_solver, sparse_solve_scipy

__all__ = ["have_scipy", "scipy_solver", "sparse_solve_scipy",
           "have_jax_sparse", "to_bcoo", "from_bcoo", "to_bcsr",
           "from_bcsr"]


def __getattr__(name):
    # torch bridge imported lazily (torch is an optional dependency)
    _torch_names = {
        "have_torch", "t2j", "j2t", "t2j_coo", "t2j_csr", "j2t_coo",
        "j2t_csr", "sparse_mm_j4t", "sparse_solve_j4t",
    }
    if name in _torch_names:
        from . import torch_bridge
        return getattr(torch_bridge, name)
    _cupy_names = {"have_cupy", "j2c_csr", "c2j_csr", "j2c_coo", "c2j_coo"}
    if name in _cupy_names:
        from . import cupy_bindings
        return getattr(cupy_bindings, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
