"""Shared test matrix, mirroring the reference's tests/test_config.py:
layouts, value dtypes, and centralised tolerance tiers (f64 baselines x100
for f32; separate direct / iterative / lstsq tiers)."""

import jax.numpy as jnp

LAYOUTS = ["coo", "csr"]
VALUE_DTYPES = [jnp.float32]  # float64 variants gated behind enable_x64
INDEX_DTYPES = [jnp.int32]


class Tol:
    direct_f32 = dict(rtol=1e-4, atol=1e-5)
    direct_f64 = dict(rtol=1e-9, atol=1e-10)
    iterative_f32 = dict(rtol=1e-3, atol=1e-4)
    iterative_f64 = dict(rtol=1e-7, atol=1e-8)
    lstsq_f32 = dict(rtol=5e-3, atol=5e-4)
    grad_f32 = dict(rtol=2e-4, atol=2e-5)


def tol(kind: str, dtype) -> dict:
    suffix = "f64" if dtype == jnp.float64 else "f32"
    return getattr(Tol, f"{kind}_{suffix}")


def make_sparse(layout, row, col, data, shape, **kw):
    from torchsparsegradutils_tpu import SparseCOO
    coo = SparseCOO(row, col, data, shape, **kw)
    return coo if layout == "coo" else coo.tocsr()
