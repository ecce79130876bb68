"""Pallas chunk-kernel correctness (interpret mode on CPU): fwd SpMM,
SDDMM, fused backward pair, grads vs the XLA path, higher-order VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import sparse_mm, sddmm
from torchsparsegradutils_tpu.utils import rand_sparse

from test_config import LAYOUTS


@pytest.fixture(params=LAYOUTS)
def layout(request):
    return request.param


def _mk(key, shape, nnz, layout):
    return rand_sparse(key, shape, nnz, layout=layout)


def test_pallas_fwd_matches_xla(key, layout):
    A = _mk(key, (40, 30), 120, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (30, 8))
    out_p = sparse_mm(A, B, backend="pallas")
    out_x = sparse_mm(A, B, backend="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_pallas_fwd_wide_rhs(key, layout):
    A = _mk(key, (24, 50), 100, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (50, 130))  # pads 256
    out_p = sparse_mm(A, B, backend="pallas")
    np.testing.assert_allclose(np.asarray(out_p),
                               np.asarray(A.todense() @ B),
                               rtol=1e-4, atol=1e-5)


def test_pallas_spmv_p1(key, layout):
    """p=1 takes the chunk-SpMV kernel (scatter-free combine): forward,
    transpose and gradients must match XLA."""
    A = _mk(key, (40, 30), 120, layout)
    x = jax.random.normal(jax.random.fold_in(key, 1), (30, 1))
    out_p = sparse_mm(A, x, backend="pallas")
    out_x = sparse_mm(A, x, backend="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)

    def loss(d, b, backend):
        return (sparse_mm(A.with_data(d), b, backend=backend) ** 2).sum()

    for arg in (0, 1):
        g_p = jax.grad(loss, argnums=arg)(A.data, x, "pallas")
        g_x = jax.grad(loss, argnums=arg)(A.data, x, "xla")
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_sddmm(key, layout):
    A = _mk(key, (20, 25), 60, layout)
    X = jax.random.normal(jax.random.fold_in(key, 1), (20, 7))
    Y = jax.random.normal(jax.random.fold_in(key, 2), (25, 7))
    v_p = sddmm(A, X, Y, backend="pallas").data
    v_x = sddmm(A, X, Y, backend="xla").data
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-5,
                               atol=1e-6)


def test_pallas_fused_backward(key, layout):
    A = _mk(key, (30, 22), 90, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (22, 6))
    G = jax.random.normal(jax.random.fold_in(key, 2), (30, 6))

    def loss(d, B, backend):
        return (sparse_mm(A.with_data(d), B, backend=backend) * G).sum()

    gA_p, gB_p = jax.grad(lambda d, B: loss(d, B, "pallas"),
                          argnums=(0, 1))(A.data, B)
    gA_x, gB_x = jax.grad(lambda d, B: loss(d, B, "xla"),
                          argnums=(0, 1))(A.data, B)
    np.testing.assert_allclose(np.asarray(gA_p), np.asarray(gA_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gB_p), np.asarray(gB_x),
                               rtol=1e-4, atol=1e-5)


def test_pallas_second_order(key, layout):
    A = _mk(key, (12, 12), 30, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (12, 3))

    def loss(d, backend):
        return (sparse_mm(A.with_data(d), B, backend=backend) ** 3).sum()

    h_p = jax.jacrev(jax.grad(lambda d: loss(d, "pallas")))(A.data)
    h_x = jax.jacrev(jax.grad(lambda d: loss(d, "xla")))(A.data)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-3,
                               atol=1e-4)


def test_pallas_jit(key, layout):
    A = _mk(key, (16, 16), 40, layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (16, 4))
    f = jax.jit(lambda sp, b: sparse_mm(sp, b, backend="pallas"))
    np.testing.assert_allclose(np.asarray(f(A, B)),
                               np.asarray(A.todense() @ B), rtol=1e-4,
                               atol=1e-5)


def test_pallas_empty_rows_and_skew(key, layout):
    """Patterns with empty rows and a dense row exercise the rank-based
    window logic."""
    row = np.array([0, 0, 0, 0, 0, 7, 19])
    col = np.array([0, 3, 5, 7, 9, 1, 2])
    from torchsparsegradutils_tpu import SparseCOO
    A = SparseCOO(row, col, jnp.arange(1.0, 8.0), (20, 10))
    if layout == "csr":
        A = A.tocsr()
    B = jax.random.normal(key, (10, 5))
    out = sparse_mm(A, B, backend="pallas")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(A.todense() @ B), rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------- logsumexp

from torchsparsegradutils_tpu import sparse_logsumexp, sparse_bidir_logsumexp  # noqa: E402
from torchsparsegradutils_tpu import SparseCOO  # noqa: E402


def _lse_fixture(layout):
    row = np.array([0, 1, 1, 3])
    col = np.array([1, 0, 2, 1])
    data = jnp.array([1.0, 2.0, 3.0, -1.0])
    coo = SparseCOO(row, col, data, (4, 4))  # row 2 / col 3 empty
    return coo if layout == "coo" else coo.tocsr()


@pytest.mark.parametrize("include_zeros", [True, False])
@pytest.mark.parametrize("dim", [0, 1])
def test_pallas_lse_matches_xla(key, layout, dim, include_zeros):
    sp = _lse_fixture(layout)
    out_p = sparse_logsumexp(sp, dim, include_zeros=include_zeros,
                             backend="pallas")
    out_x = sparse_logsumexp(sp, dim, include_zeros=include_zeros,
                             backend="xla")
    a, b = np.asarray(out_p), np.asarray(out_x)
    assert (np.isneginf(a) == np.isneginf(b)).all()
    fin = np.isfinite(b)
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("include_zeros", [True, False])
def test_pallas_lse_random(key, layout, include_zeros):
    from torchsparsegradutils_tpu.utils import rand_sparse
    sp = rand_sparse(key, (30, 22), 80, layout=layout)
    for dim in (0, 1):
        out_p = sparse_logsumexp(sp, dim, include_zeros=include_zeros,
                                 backend="pallas")
        out_x = sparse_logsumexp(sp, dim, include_zeros=include_zeros,
                                 backend="xla")
        a, b = np.asarray(out_p), np.asarray(out_x)
        fin = np.isfinite(b)
        assert (np.isfinite(a) == fin).all()
        np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=1e-6)


def test_pallas_lse_grad(key, layout):
    from torchsparsegradutils_tpu.utils import rand_sparse
    sp = rand_sparse(key, (25, 18), 60, layout=layout)
    for dim in (0, 1):
        def loss(d, backend, dim=dim):
            out = sparse_logsumexp(sp.with_data(d), dim, backend=backend)
            return jnp.where(jnp.isfinite(out), out, 0.0).sum()

        g_p = jax.grad(lambda d: loss(d, "pallas"))(sp.data)
        g_x = jax.grad(lambda d: loss(d, "xla"))(sp.data)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   rtol=1e-4, atol=1e-6)


def test_grid_lse_plan_selected(key):
    """A balanced random pattern must take the ELL-grid LSE path; a
    degree-skewed one must fall back to the chunk kernel (grid plan gate
    n*K > 8*nnz) — both paths stay correct."""
    from torchsparsegradutils_tpu.kernels.grid_lse import (
        build_ell_grid_plan)
    from torchsparsegradutils_tpu.utils import rand_sparse

    sp = rand_sparse(key, (40, 30), 160, layout="csr")
    assert build_ell_grid_plan(sp.row_sa(), sp.col_sa(), 40, 30) is not None

    # skew: one row holds 60 of 70 entries -> K=60, n*K=2400 > 8*70
    row = np.concatenate([np.zeros(60, np.int64),
                          np.arange(1, 11, dtype=np.int64)])
    col = np.concatenate([np.arange(60, dtype=np.int64),
                          np.arange(10, dtype=np.int64)])
    data = jnp.asarray(np.random.default_rng(0).normal(size=70)
                       ).astype(jnp.float32)
    skew = SparseCOO(row, col, data, (40, 64))
    assert build_ell_grid_plan(skew.row_sa(), skew.col_sa(), 40, 64) is None
    for sp_i in (sp, skew):
        for iz in (True, False):
            out_p = sparse_logsumexp(sp_i, 1, include_zeros=iz,
                                     backend="pallas")
            out_x = sparse_logsumexp(sp_i, 1, include_zeros=iz,
                                     backend="xla")
            a, b = np.asarray(out_p), np.asarray(out_x)
            fin = np.isfinite(b)
            assert (np.isfinite(a) == fin).all()
            np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5,
                                       atol=1e-6)

        def loss(d, backend, sp_i=sp_i):
            out = sparse_logsumexp(sp_i.with_data(d), 1, backend=backend)
            return jnp.where(jnp.isfinite(out), out, 0.0).sum()

        g_p = jax.grad(lambda d: loss(d, "pallas"))(sp_i.data)
        g_x = jax.grad(lambda d: loss(d, "xla"))(sp_i.data)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   rtol=1e-4, atol=1e-6)


def test_pallas_lse_inf_values(layout):
    row = np.array([0, 0, 1])
    col = np.array([0, 1, 1])
    data = jnp.array([jnp.inf, 1.0, -jnp.inf])
    coo = SparseCOO(row, col, data, (2, 2))
    sp = coo if layout == "coo" else coo.tocsr()
    out = sparse_logsumexp(sp, 1, include_zeros=False, backend="pallas")
    assert np.isposinf(np.asarray(out)[0])
    assert np.isneginf(np.asarray(out)[1])


def test_pallas_bidir(key, layout):
    from torchsparsegradutils_tpu.utils import rand_sparse
    sp = rand_sparse(key, (14, 20), 40, layout=layout)
    col_p, row_p = sparse_bidir_logsumexp(sp, backend="pallas")
    col_x, row_x = sparse_bidir_logsumexp(sp, backend="xla")
    for a, b in ((col_p, col_x), (row_p, row_x)):
        a, b = np.asarray(a), np.asarray(b)
        fin = np.isfinite(b)
        np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=1e-6)
    pad_p = sparse_bidir_logsumexp(sp, output_layout="padded",
                                   backend="pallas")
    pad_x = sparse_bidir_logsumexp(sp, output_layout="padded",
                                   backend="xla")
    a, b = np.asarray(pad_p), np.asarray(pad_x)
    fin = np.isfinite(b)
    assert (np.isneginf(a) == np.isneginf(b)).all()
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5, atol=1e-6)


def test_fast_grad_precision(key, layout):
    """grad_precision='fast' (bf16 V buffer): gradA stays exact, gradB
    within bf16 tolerance."""
    from torchsparsegradutils_tpu.utils import rand_sparse
    A = rand_sparse(key, (30, 22), 90, layout=layout)
    B = jax.random.normal(jax.random.fold_in(key, 1), (22, 6))

    def loss(d, B, gp):
        return (sparse_mm(A.with_data(d), B, backend="pallas",
                          grad_precision=gp) ** 2).sum()

    gA_f, gB_f = jax.grad(lambda d, B: loss(d, B, "fast"),
                          argnums=(0, 1))(A.data, B)
    gA_e, gB_e = jax.grad(lambda d, B: loss(d, B, "exact"),
                          argnums=(0, 1))(A.data, B)
    np.testing.assert_allclose(np.asarray(gA_f), np.asarray(gA_e),
                               rtol=1e-4, atol=1e-5)  # gradA exact
    np.testing.assert_allclose(np.asarray(gB_f), np.asarray(gB_e),
                               rtol=3e-2, atol=3e-2)  # gradB bf16-class


class TestShuffle:
    """3-stage static permutation (kernels/shuffle.py)."""

    @pytest.mark.parametrize("n", [5, 128, 3000, 50_000])
    def test_forward_matches_take(self, n):
        import jax.numpy as jnp
        from torchsparsegradutils_tpu.kernels.shuffle import (
            build_shuffle_plan, shuffle_values)
        rng = np.random.default_rng(n)
        perm = rng.permutation(n)
        plan = build_shuffle_plan(perm, n)
        assert plan is not None
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        out = shuffle_values(plan, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v)[perm])

    def test_vjp_is_inverse_scatter(self):
        import jax
        import jax.numpy as jnp
        from torchsparsegradutils_tpu.kernels.shuffle import (
            build_shuffle_plan, shuffle_values)
        rng = np.random.default_rng(3)
        n = 4096
        perm = rng.permutation(n)
        plan = build_shuffle_plan(perm, n)
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        w = rng.standard_normal(n).astype(np.float32)
        g = jax.grad(lambda d: jnp.vdot(
            shuffle_values(plan, d), jnp.asarray(w)))(v)
        want = np.zeros(n, np.float32)
        want[perm] = w
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)

    def test_jit_and_shape_check(self):
        import jax
        import jax.numpy as jnp
        from torchsparsegradutils_tpu.kernels.shuffle import (
            build_shuffle_plan, shuffle_values)
        rng = np.random.default_rng(4)
        n = 257
        perm = rng.permutation(n)
        plan = build_shuffle_plan(perm, n)
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        out = jax.jit(lambda d: shuffle_values(plan, d))(v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v)[perm])
        with pytest.raises(ValueError, match="expected shape"):
            shuffle_values(plan, v[:-1])


class TestPermuteValues:
    """Differentiable static permutation (kernels/shuffle.py:
    permute_values) — the drop-in CSC/transpose value reorder.  The
    expansion-gather route is TPU-gated, so these tests force both
    branches explicitly."""

    def _perm(self, n, seed=0):
        from torchsparsegradutils_tpu.types import StaticArray
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n).astype(np.int64)
        return StaticArray(perm), perm, rng

    @pytest.mark.parametrize("force_expand", [False, True])
    def test_forward_and_vjp(self, force_expand, monkeypatch):
        import jax
        import jax.numpy as jnp
        from torchsparsegradutils_tpu.kernels import shuffle as sh
        if force_expand:
            monkeypatch.setattr(sh, "_use_expand", lambda n, dt: True)
        n = 3000
        perm_sa, perm, rng = self._perm(n)
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        out = jax.jit(lambda d: sh.permute_values(perm_sa, d))(v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v)[perm],
                                   rtol=1e-6)
        # VJP = inverse permutation (not a scatter)
        w = rng.standard_normal(n).astype(np.float32)
        g = jax.grad(lambda d: jnp.vdot(
            sh.permute_values(perm_sa, d), jnp.asarray(w)))(v)
        want = np.zeros(n, np.float32)
        want[perm] = w
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)

    def test_expand_take_matches_flat(self, monkeypatch):
        import jax.numpy as jnp
        from torchsparsegradutils_tpu.kernels import shuffle as sh
        n = 1000
        perm_sa, perm, rng = self._perm(n, seed=7)
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        got = sh._expand_take(jnp.asarray(perm), v)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(v)[perm])


class TestBF16StorageFastPath:
    """All-bf16 containers through the chunk kernels: the storage fast
    path (half the gather/stream HBM bytes; measured 2.4x lower gather
    floor — benchmarks/probe_random_gather.py gather_bf16).  Value tiles
    and row partials run f32 inside the kernels (bf16 (SB, C) blocks
    violate Mosaic's 16-sublane tile), so accumulation is exact and the
    only error is the bf16 *storage* rounding of the operands."""

    def _mk(self, key):
        A = rand_sparse(key, (300, 300), 3000, layout="csr")
        Ab = A.with_data(A.data.astype(jnp.bfloat16))
        B = jax.random.normal(jax.random.fold_in(key, 1), (300, 64),
                              jnp.bfloat16)
        return A, Ab, B

    def test_bf16_fwd(self, key):
        A, Ab, B = self._mk(key)
        out = sparse_mm(Ab, B, backend="pallas")
        assert out.dtype == jnp.bfloat16
        ref = A.todense() @ B.astype(jnp.float32)
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
        assert float(err) / float(jnp.max(jnp.abs(ref))) < 2e-2

    def test_bf16_fused_backward(self, key):
        A, Ab, B = self._mk(key)
        G = jax.random.normal(jax.random.fold_in(key, 2), (300, 64),
                              jnp.bfloat16)

        def loss(d, b):
            y = sparse_mm(Ab.with_data(d), b, backend="pallas")
            return (y.astype(jnp.float32) * G.astype(jnp.float32)).sum()

        gd, gb = jax.grad(loss, argnums=(0, 1))(Ab.data, B)
        assert gd.dtype == jnp.bfloat16 and gb.dtype == jnp.bfloat16
        gd_ref, gb_ref = jax.grad(
            lambda d, b: ((A.with_data(d).todense() @ b)
                          * G.astype(jnp.float32)).sum(),
            argnums=(0, 1))(A.data, B.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(gd, np.float32),
                                   np.asarray(gd_ref), rtol=0, atol=0.3)
        np.testing.assert_allclose(np.asarray(gb, np.float32),
                                   np.asarray(gb_ref), rtol=0, atol=0.3)

    def test_bf16_sddmm(self, key):
        A, Ab, _ = self._mk(key)
        X = jax.random.normal(key, (300, 32), jnp.bfloat16)
        Y = jax.random.normal(jax.random.fold_in(key, 3), (300, 32),
                              jnp.bfloat16)
        sv = sddmm(Ab, X, Y, backend="pallas")
        assert sv.data.dtype == jnp.bfloat16
        r = np.asarray(A.tocoo().rows_np())
        c = np.asarray(A.tocoo().cols_np())
        ref = np.asarray(X.astype(jnp.float32)
                         @ Y.astype(jnp.float32).T)[r, c]
        err = np.max(np.abs(np.asarray(sv.data, np.float32) - ref))
        assert err / np.max(np.abs(ref)) < 2e-2

    def test_bf16_spmv(self, key):
        A, Ab, _ = self._mk(key)
        x = jax.random.normal(jax.random.fold_in(key, 4), (300,),
                              jnp.bfloat16)
        out = sparse_mm(Ab, x[:, None], backend="pallas")[:, 0]
        ref = A.todense() @ x.astype(jnp.float32)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        assert err / float(jnp.max(jnp.abs(ref))) < 2e-2

    def test_f32_unchanged(self, key):
        A, _, B = self._mk(key)
        out = sparse_mm(A, B.astype(jnp.float32), backend="pallas")
        assert out.dtype == jnp.float32
        ref = A.todense() @ B.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
