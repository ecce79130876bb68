"""Beneš-network static permutation engine (kernels/benes.py).

The network factors an arbitrary static permutation into 2·log2(N)−1
oblivious XOR-exchange stages (streaming ops — the TPU answer to the
per-scalar gather floor; no reference analogue).  These tests pin the
routing (python and native C++ routers), the device application
(forward, inverse, jit), the injective-gather extension used by the
triangular-solve ELL tables, and numerical exactness (pure routing —
values must be bit-identical).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchsparsegradutils_tpu.kernels import benes
from torchsparsegradutils_tpu.types import StaticArray


class TestRouting:
    @pytest.mark.parametrize("n", [2, 4, 8, 64, 128, 1024])
    def test_python_router_realises_perm(self, n):
        rng = np.random.default_rng(n)
        perm = rng.permutation(n).astype(np.int64)
        masks = benes._route_py(perm)
        assert masks.shape == (2 * (n.bit_length() - 1) - 1, n)
        # emulate the stages in numpy
        y = np.arange(n)
        for s, d in enumerate(benes._stage_distances(n)):
            idx = np.arange(n) ^ d
            y = np.where(masks[s] != 0, y[idx], y)
        np.testing.assert_array_equal(y, perm)

    def test_native_router_matches_semantics(self):
        from torchsparsegradutils_tpu import native
        if not native.available():
            pytest.skip("no native library")
        rng = np.random.default_rng(7)
        n = 4096
        perm = rng.permutation(n).astype(np.int64)
        masks = native.benes_route(perm)
        assert masks is not None and masks.shape[0] == 23
        y = np.arange(n)
        for s, d in enumerate(benes._stage_distances(n)):
            y = np.where(masks[s] != 0, y[np.arange(n) ^ d], y)
        np.testing.assert_array_equal(y, perm)

    def test_pairs_swap_together(self):
        rng = np.random.default_rng(3)
        n = 256
        masks = benes._route_py(rng.permutation(n).astype(np.int64))
        for s, d in enumerate(benes._stage_distances(n)):
            np.testing.assert_array_equal(masks[s], masks[s][np.arange(n) ^ d])


class TestApply:
    @pytest.mark.parametrize("n", [100, 128, 3000, 50000])
    def test_permute_fwd_inverse_jit(self, n):
        rng = np.random.default_rng(n)
        perm = rng.permutation(n).astype(np.int64)
        sa = StaticArray(perm)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        out = jax.jit(lambda v: benes.benes_permute(sa, v))(x)
        # pure routing: bit-exact
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])
        back = jax.jit(lambda v: benes.benes_permute(sa, v, inverse=True))(out)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_bfloat16_stream(self):
        rng = np.random.default_rng(0)
        n = 1000
        perm = rng.permutation(n).astype(np.int64)
        sa = StaticArray(perm)
        x = jnp.asarray(rng.standard_normal(n), dtype=jnp.bfloat16)
        out = benes.benes_permute(sa, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])

    def test_identity(self):
        n = 512
        sa = StaticArray(np.arange(n, dtype=np.int64))
        x = jnp.arange(n, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(benes.benes_permute(sa, x)),
                                      np.asarray(x))


class TestGather:
    def test_injective_table_fill_and_transpose(self):
        rng = np.random.default_rng(5)
        n_in = 5000
        T = 400 * 16
        sel = np.full(T, n_in, np.int64)
        slots = rng.choice(T, size=n_in, replace=False)
        sel[slots] = rng.permutation(n_in)
        sel_sa = StaticArray(sel.reshape(400, 16))
        x = jnp.asarray(rng.standard_normal(n_in).astype(np.float32))
        out = jax.jit(lambda v: benes.benes_gather(sel_sa, n_in, v))(x)
        x_ext = np.concatenate([np.asarray(x), [0.0]])
        np.testing.assert_array_equal(
            np.asarray(out), x_ext[np.minimum(sel, n_in)].reshape(400, 16))
        ct = jnp.asarray(rng.standard_normal(T).astype(np.float32)
                         .reshape(400, 16))
        dx = jax.jit(lambda c: benes.benes_gather_t(sel_sa, n_in, c))(ct)
        want = np.zeros(n_in, np.float32)
        want[sel[slots]] = np.asarray(ct).reshape(-1)[slots]
        np.testing.assert_array_equal(np.asarray(dx), want)

    def test_non_injective_rejected(self):
        sel = StaticArray(np.zeros((8, 4), np.int64))  # index 0 repeated
        assert not benes.has_gather_plan(sel, 16)
        with pytest.raises(ValueError, match="no routing"):
            benes.benes_gather(sel, 16, jnp.ones(16))

    def test_val_gather_wiring_forced(self, monkeypatch):
        """The triangular-solve ELL fill takes the network route on TPU;
        force the gate on CPU and check fwd + VJP semantics match the
        flat-take branch exactly."""
        import torchsparsegradutils_tpu.ops.triangular_solve as ts
        from torchsparsegradutils_tpu.kernels import dispatch
        monkeypatch.setattr(ts, "BENES_TABLE_MIN", 1)
        monkeypatch.setattr(dispatch, "on_tpu", lambda: True)
        rng = np.random.default_rng(0)
        nnz, T = 3000, (300, 12)
        sel = np.full(T[0] * T[1], nnz, np.int64)
        slots = rng.choice(T[0] * T[1], size=nnz, replace=False)
        sel[slots] = rng.permutation(nnz)
        sel = sel.reshape(T)
        f = ts._make_val_gather(sel, nnz)
        d = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
        out = jax.jit(f)(d)
        ext = np.concatenate([np.asarray(d), [0.0]])
        np.testing.assert_array_equal(np.asarray(out),
                                      ext[np.minimum(sel, nnz)])
        ct = rng.standard_normal(T).astype(np.float32)
        g = jax.grad(lambda x: (f(x) * jnp.asarray(ct)).sum())(d)
        want = np.zeros(nnz, np.float32)
        want[sel.reshape(-1)[slots]] = ct.reshape(-1)[slots]
        np.testing.assert_array_equal(np.asarray(g), want)

    def test_permute_values_benes_forced(self, monkeypatch):
        from torchsparsegradutils_tpu.kernels import shuffle as sh
        monkeypatch.setattr(sh, "_use_benes", lambda n, dt: True)
        rng = np.random.default_rng(2)
        n = 2000
        perm = rng.permutation(n).astype(np.int64)
        sa = StaticArray(perm)
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        out = jax.jit(lambda d: sh.permute_values(sa, d))(v)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(v)[perm])
        w = rng.standard_normal(n).astype(np.float32)
        g = jax.grad(lambda d: jnp.vdot(
            sh.permute_values(sa, d), jnp.asarray(w)))(v)
        want = np.zeros(n, np.float32)
        want[perm] = w
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)

    def test_unreferenced_data_entries_ok(self):
        # sel referencing only half the inputs: transpose must zero the rest
        n_in = 64
        sel_sa = StaticArray(np.arange(32, dtype=np.int64))
        x = jnp.arange(n_in, dtype=jnp.float32)
        out = benes.benes_gather(sel_sa, n_in, x)
        np.testing.assert_array_equal(np.asarray(out), np.arange(32.0))
        dx = benes.benes_gather_t(sel_sa, n_in, jnp.ones(32))
        np.testing.assert_array_equal(np.asarray(dx),
                                      np.r_[np.ones(32), np.zeros(32)])
