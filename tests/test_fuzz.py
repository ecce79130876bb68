"""Seeded cross-op fuzz: random shapes/layouts/densities, every op family
checked against its dense reference (forward AND gradient at the mask).

Complements the structured dtype-matrix tests with irregular shapes
(non-multiples of 8/128, tall/wide, near-empty and near-dense patterns)
— the configurations that historically break padding/tiling logic in
the planners (chunk ranks, DIA grids, ELL tables).
"""

import jax
import numpy as np
import pytest

from torchsparsegradutils_tpu import sddmm, sparse_logsumexp, sparse_mm
from torchsparsegradutils_tpu.utils import rand_sparse

CONFIGS = [
    # (n, m, nnz, layout)
    (1, 1, 1, "coo"),
    (3, 257, 100, "csr"),
    (257, 3, 100, "coo"),
    (129, 129, 16, "csr"),          # near-empty
    (40, 40, 1500, "coo"),          # ~dense
    (100, 7, 300, "csr"),
    (7, 100, 300, "coo"),
    (255, 128, 1000, "csr"),
    (128, 255, 1000, "coo"),
    (1000, 1000, 5000, "csr"),
]


@pytest.fixture(params=range(len(CONFIGS)),
                ids=[f"{n}x{m}nnz{z}{lay}" for n, m, z, lay in CONFIGS])
def cfg(request, key):
    n, m, nnz, layout = CONFIGS[request.param]
    A = rand_sparse(jax.random.fold_in(key, request.param), (n, m), nnz,
                    layout=layout)
    return A, A.todense()


def test_spmm_and_grads(cfg, key):
    A, Ad = cfg
    n, m = A.shape
    B = jax.random.normal(jax.random.fold_in(key, 101), (m, 5))
    G = jax.random.normal(jax.random.fold_in(key, 102), (n, 5))
    out = sparse_mm(A, B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(Ad @ B),
                               rtol=1e-4, atol=1e-5)
    gd, gb = jax.grad(lambda d, b: (sparse_mm(A.with_data(d), b) * G).sum(),
                      argnums=(0, 1))(A.data, B)
    rd, rb = jax.grad(lambda M, b: ((M @ b) * G).sum(),
                      argnums=(0, 1))(Ad, B)
    rows, cols = np.asarray(A.rows()), np.asarray(A.cols())
    np.testing.assert_allclose(np.asarray(gd),
                               np.asarray(rd)[rows, cols],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4,
                               atol=1e-5)


def test_sddmm_matches_dense(cfg, key):
    A, Ad = cfg
    n, m = A.shape
    X = jax.random.normal(jax.random.fold_in(key, 103), (n, 4))
    Y = jax.random.normal(jax.random.fold_in(key, 104), (m, 4))
    out = sddmm(A, X, Y)
    rows, cols = np.asarray(A.rows()), np.asarray(A.cols())
    ref = np.asarray(X @ Y.T)[rows, cols]
    np.testing.assert_allclose(np.asarray(out.data), ref, rtol=1e-4,
                               atol=1e-5)


def test_logsumexp_both_dims(cfg):
    A, Ad = cfg
    import jax.scipy.special as jsp
    for dim in (0, 1):
        out = sparse_logsumexp(A, dim=dim)
        ref = jsp.logsumexp(Ad, axis=dim)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
