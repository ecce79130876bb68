"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: row-sharded
SpMM equivalence, 2-D (dp x tp) training step correctness vs the
single-device loss, and loss decrease over steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from torchsparsegradutils_tpu.parallel import (
    init_params,
    loss_fn,
    make_model,
    make_train_step,
    shard_rows,
    sharded_sparse_mm,
)
from torchsparsegradutils_tpu.utils import rand_sparse


def _mesh1d(axis="x", n=8):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_spmm_matches_dense(key):
    A = rand_sparse(key, (50, 30), 200)
    B = jax.random.normal(jax.random.fold_in(key, 1), (30, 7))
    mesh = _mesh1d()
    M = shard_rows(A, 8)
    out = sharded_sparse_mm(M, B, mesh, "x")
    ref = A.todense() @ B
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_sharded_spmm_grad(key):
    A = rand_sparse(key, (24, 24), 80)
    B = jax.random.normal(jax.random.fold_in(key, 1), (24, 3))
    mesh = _mesh1d(n=4)
    M = shard_rows(A, 4)

    def loss(data, B):
        M2 = type(M)(local_rows=M.local_rows, cols=M.cols, data=data,
                     shape=M.shape, rows_per_shard=M.rows_per_shard,
                     n_shards=M.n_shards)
        return (sharded_sparse_mm(M2, B, mesh, "x") ** 2).sum()

    g_data, g_B = jax.grad(loss, argnums=(0, 1))(M.data, B)
    ref_gB = jax.grad(lambda B: ((A.todense() @ B) ** 2).sum())(B)
    np.testing.assert_allclose(np.asarray(g_B), np.asarray(ref_gB),
                               rtol=1e-4, atol=1e-5)
    assert g_data.shape == M.data.shape


def test_train_step_matches_single_device(key):
    enc = make_model((1, 4, 4), radius=1.0)
    params = init_params(key, enc)
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (16, enc.volume_numel))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
    step = make_train_step(enc, mesh, lr=0.0)  # lr=0: loss check only
    _, loss_sharded = step(params, x)
    loss_ref = loss_fn(params, x, enc)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref),
                               rtol=1e-5)


def test_train_step_decreases_loss(key):
    enc = make_model((1, 4, 4), radius=1.0)
    params = init_params(key, enc)
    # observations from a correlated Gaussian
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (32, enc.volume_numel))
    x = x.at[:, 1:].add(0.5 * x[:, :-1])
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    step = make_train_step(enc, mesh, lr=5e-2)
    losses = []
    for _ in range(10):
        params, l = step(params, x)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_train_step_grad_matches_single_device(key):
    enc = make_model((1, 3, 3), radius=1.0)
    params = init_params(key, enc)
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (8, enc.volume_numel))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    step = make_train_step(enc, mesh, lr=1.0)
    new_params, _ = step(params, x)
    g_ref = jax.grad(lambda p: loss_fn(p, x, enc))(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(new_params[k]),
            np.asarray(params[k]) - np.asarray(g_ref[k]),
            rtol=1e-4, atol=1e-5)


def test_sharded_chunk_spmm(key):
    """Pallas chunk kernel composed with shard_map row sharding."""
    from torchsparsegradutils_tpu.parallel.chunk_sharded import (
        build_sharded_chunk_plan, sharded_chunk_spmm)
    A = rand_sparse(key, (64, 40), 400, layout="csr")
    B = jax.random.normal(jax.random.fold_in(key, 1), (40, 8))
    mesh = _mesh1d()
    plan = build_sharded_chunk_plan(A, 8, C=128)
    out = sharded_chunk_spmm(plan, A.data, B, mesh, "x")
    ref = A.todense() @ B
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_sharded_chunk_spmm_uneven(key):
    from torchsparsegradutils_tpu.parallel.chunk_sharded import (
        build_sharded_chunk_plan, sharded_chunk_spmm)
    # n not divisible by shards; some shards nearly empty
    import numpy as _np
    from torchsparsegradutils_tpu import SparseCOO
    row = _np.array([0, 0, 1, 5, 61])
    col = _np.array([1, 3, 2, 0, 4])
    A = SparseCOO(row, col, jnp.arange(1.0, 6.0), (62, 5)).tocsr()
    B = jax.random.normal(key, (5, 4))
    mesh = _mesh1d(n=4)
    plan = build_sharded_chunk_plan(A, 4, C=128)
    out = sharded_chunk_spmm(plan, A.data, B, mesh, "x")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(A.todense() @ B), rtol=1e-4,
                               atol=1e-5)


def test_sharded_chunk_spmm_grad(key):
    """Differentiable sharded Pallas SpMM: sparse gradA at every shard's
    nonzeros + psum'd gradB (VERDICT r1 item 6)."""
    from torchsparsegradutils_tpu.parallel.chunk_sharded import (
        build_sharded_chunk_plan, sharded_chunk_spmm)
    A = rand_sparse(key, (64, 40), 400, layout="csr")
    B = jax.random.normal(jax.random.fold_in(key, 1), (40, 5))
    G = jax.random.normal(jax.random.fold_in(key, 2), (64, 5))
    mesh = _mesh1d(n=8)
    plan = build_sharded_chunk_plan(A, 8)

    def loss(d, b):
        return (sharded_chunk_spmm(plan, d, b, mesh, "x") * G).sum()

    gd, gb = jax.grad(loss, argnums=(0, 1))(A.data, B)
    Ad = A.todense()
    rows, cols = jnp.asarray(A.rows()), jnp.asarray(A.cols())

    def dense_loss(d, b):
        return ((jnp.zeros_like(Ad).at[rows, cols].set(d) @ b) * G).sum()

    rd, rb = jax.grad(dense_loss, argnums=(0, 1))(A.data, B)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4,
                               atol=1e-5)


def test_local_shard_spmm_grad_values(key):
    """gradA VALUES parity for the in-shard library op (not just shape)."""
    from torchsparsegradutils_tpu.parallel import (local_shard_spmm,
                                                   shard_rows,
                                                   sharded_sparse_mm)
    A = rand_sparse(key, (24, 24), 80)
    B = jax.random.normal(jax.random.fold_in(key, 1), (24, 3))
    mesh = _mesh1d(n=4)
    M = shard_rows(A, 4)

    def loss(data, B):
        M2 = type(M)(local_rows=M.local_rows, cols=M.cols, data=data,
                     shape=M.shape, rows_per_shard=M.rows_per_shard,
                     n_shards=M.n_shards, mask=M.mask)
        return (sharded_sparse_mm(M2, B, mesh, "x") ** 2).sum()

    g_data, _ = jax.grad(loss, argnums=(0, 1))(M.data, B)
    # reference grads at nnz, reassembled into the shard layout
    rows, cols = jnp.asarray(A.rows()), jnp.asarray(A.cols())
    Ad = jnp.zeros((24, 24)).at[rows, cols].set(A.data)
    rg = jax.grad(lambda d: ((jnp.zeros((24, 24)).at[rows, cols].set(d)
                              @ B) ** 2).sum())(A.data)
    M_ref = shard_rows(A.with_data(rg), 4)
    np.testing.assert_allclose(np.asarray(g_data), np.asarray(M_ref.data),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# fully sharded DIA SpMM (B row-sharded too; ICI halo exchange)
# ---------------------------------------------------------------------------


def test_sharded_dia_spmm_matches_dense(key):
    from torchsparsegradutils_tpu.parallel import sharded_dia_spmm
    from torchsparsegradutils_tpu.utils.random_sparse import stencil_sparse
    n = 512
    A = stencil_sparse(key, (n, n), [-8, -1, 0, 1, 8], layout="csr")
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, 16))
    mesh = _mesh1d()
    f = sharded_dia_spmm(A, mesh, "x")
    assert f.halo == (8, 8)
    out = f(A.data, B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(A.todense() @ B),
                               rtol=1e-4, atol=1e-5)


def test_sharded_dia_spmm_grads_match_dense(key):
    """Both gradients — incl. the reverse halo exchange XLA derives by
    transposing the forward ppermutes — match the dense reference."""
    from torchsparsegradutils_tpu.parallel import sharded_dia_spmm
    from torchsparsegradutils_tpu.utils.random_sparse import stencil_sparse
    n = 256
    A = stencil_sparse(key, (n, n), [-16, -1, 0, 2], layout="csr")
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, 8))
    G = jax.random.normal(jax.random.fold_in(key, 2), (n, 8))
    mesh = _mesh1d()
    f = sharded_dia_spmm(A, mesh, "x")
    gd, gb = jax.jit(jax.grad(lambda d, b: (f(d, b) * G).sum(),
                              argnums=(0, 1)))(A.data, B)
    rows, cols = np.asarray(A.rows()), np.asarray(A.cols())
    rd, rb = jax.grad(lambda M, b: ((M @ b) * G).sum(),
                      argnums=(0, 1))(A.todense(), B)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd)[rows, cols],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4,
                               atol=1e-5)


def test_sharded_dia_rejects_wide_halo_and_nondia(key):
    from torchsparsegradutils_tpu.parallel import sharded_dia_spmm
    from torchsparsegradutils_tpu.utils.random_sparse import stencil_sparse
    A = stencil_sparse(key, (64, 64), [-32, 0, 32], layout="csr")
    with pytest.raises(ValueError, match="halo"):
        sharded_dia_spmm(A, _mesh1d(), "x")  # 32-row halo > 8-row slab
    R = rand_sparse(jax.random.fold_in(key, 3), (64, 64), 400)
    with pytest.raises(ValueError, match="pure-DIA|not pure"):
        sharded_dia_spmm(R, _mesh1d(), "x")


def test_distributed_cg_on_sharded_stencil(key):
    """linear_cg over the sharded matvec: a multi-device Krylov solve."""
    from torchsparsegradutils_tpu.parallel import matvec_closures
    from torchsparsegradutils_tpu.solvers import linear_cg
    from torchsparsegradutils_tpu.utils.random_sparse import make_spd_stencil
    n = 512
    A = make_spd_stencil(key, n, [-8, -1, 0, 1, 8])
    rhs = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    mesh = _mesh1d()
    mv, mv_t = matvec_closures(A, mesh, "x")
    x = jax.jit(lambda r: linear_cg(mv, r))(rhs)
    res = np.linalg.norm(np.asarray(A.todense() @ x - rhs))
    assert res / np.linalg.norm(np.asarray(rhs)) < 1e-4
    # transpose closure consistency (A is symmetric here)
    np.testing.assert_allclose(np.asarray(mv(rhs)), np.asarray(mv_t(rhs)),
                               rtol=1e-4, atol=1e-5)
