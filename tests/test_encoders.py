"""PairwiseEncoder tests: offset/coord generation (against the reference's
documented examples), index-pair correctness vs a naive dense assembly,
COO/CSR consistency, batching, jit, grad flow, and the
encoder->distribution->rsample->backward integration path (mirrors
reference tests/test_encoders.py + test_integration_pairwise_sparse_mvn.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu.models import SparseMultivariateNormal
from torchsparsegradutils_tpu.models.encoders import (
    PairwiseEncoder,
    PairwiseVoxelEncoder,
    _gen_coords_nd,
    _gen_offsets_nd,
    calc_pairwise_coo_indices_nd,
)


def test_gen_coords_examples():
    assert _gen_coords_nd(2.0, 1) == {(-2,), (-1,), (1,), (2,)}
    assert sorted(_gen_coords_nd(1.5, 2)) == [
        (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
        (1, 1)]
    assert sorted(_gen_coords_nd(1.0, 3)) == [
        (-1, 0, 0), (0, -1, 0), (0, 0, -1), (0, 0, 1), (0, 1, 0),
        (1, 0, 0)]
    with pytest.raises(ValueError):
        _gen_coords_nd(1.0, 0)


def test_gen_offsets_examples():
    assert _gen_offsets_nd(1.0, 1, upper=False)[0] == (0, 1)
    assert _gen_offsets_nd(1.0, 1, upper=False) == [(0, 1)]
    offs = _gen_offsets_nd(1.5, 2)
    assert offs[:4] == [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0)]
    intra = _gen_offsets_nd(1.0, 2, num_channels=2,
                            channel_voxel_relation="intra")
    assert intra == [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0),
                     (1, 0, 0)]
    inter = _gen_offsets_nd(1.0, 2, num_channels=2,
                            channel_voxel_relation="inter")
    assert any(o[0] == 1 and o[1:] != (0, 0) for o in inter)
    up = _gen_offsets_nd(1.0, 2, upper=True)
    assert all(next(v for v in o if v != 0) < 0 for o in up)


def test_calc_indices_shapes():
    idxs = calc_pairwise_coo_indices_nd(1.0, (1, 3, 3), diag=True)
    assert idxs[(0, 0, 0)].shape == (2, 9)
    assert sorted(idxs.keys())[:3] == [(0, -1, 0), (0, 0, -1), (0, 0, 0)]
    # shifted-pair property: second row = first row shifted by offset
    off = (0, 0, 1)
    i, j = idxs[off]
    # linear offset of (0,0,1) in a (1,3,3) volume is 1
    assert ((i - j) == 1).all()
    with pytest.raises(ValueError, match="radius"):
        calc_pairwise_coo_indices_nd(0.5, (1, 3, 3))
    with pytest.raises(ValueError, match="indep"):
        calc_pairwise_coo_indices_nd(1.0, (1, 3, 3),
                                     channel_voxel_relation="intra")


def _dense_reference(enc, values):
    """Naive dense assembly from the per-offset index dict."""
    S = enc.volume_numel
    idx_dict = calc_pairwise_coo_indices_nd(
        enc.radius, enc.volume_shape, enc.diag, enc.upper,
        enc.channel_voxel_relation)
    dense = np.zeros((S, S), np.float32)
    from torchsparsegradutils_tpu.models.encoders import _trim_nd
    for k, off in enumerate(enc.offsets):
        v = _trim_nd(np.asarray(values[k]), off).reshape(-1)
        i, j = idx_dict[off]
        dense[i, j] += v
    return dense


@pytest.mark.parametrize("layout", ["coo", "csr"])
@pytest.mark.parametrize("upper,diag", [(None, True), (True, True),
                                        (False, False)])
def test_encoder_vs_dense(key, layout, upper, diag):
    enc = PairwiseEncoder(1.5, (2, 4, 5), diag=diag, upper=upper,
                          channel_voxel_relation="intra", layout=layout)
    values = jax.random.normal(key, (len(enc.offsets),) + enc.volume_shape)
    sp = enc(values)
    assert sp.shape == (enc.volume_numel, enc.volume_numel)
    np.testing.assert_allclose(np.asarray(sp.todense()),
                               _dense_reference(enc, values), atol=1e-6)


@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_encoder_3d_inter(key, layout):
    enc = PairwiseEncoder(1.0, (3, 3, 4, 3), diag=True,
                          channel_voxel_relation="inter", layout=layout)
    values = jax.random.normal(key, (len(enc.offsets),) + enc.volume_shape)
    sp = enc(values)
    np.testing.assert_allclose(np.asarray(sp.todense()),
                               _dense_reference(enc, values), atol=1e-6)


@pytest.mark.parametrize("layout", ["coo", "csr"])
def test_encoder_batched(key, layout):
    enc = PairwiseEncoder(1.0, (1, 4, 4), diag=True, layout=layout)
    values = jax.random.normal(key, (3, len(enc.offsets), 1, 4, 4))
    sp = enc(values)
    assert sp.shape == (3, 16, 16)
    for b in range(3):
        np.testing.assert_allclose(np.asarray(sp.todense()[b]),
                                   _dense_reference(enc, values[b]),
                                   atol=1e-6)


def test_encoder_jit_and_grad(key):
    enc = PairwiseEncoder(1.0, (1, 4, 4), diag=True, layout="csr")
    values = jax.random.normal(key, (len(enc.offsets), 1, 4, 4))

    @jax.jit
    def f(v):
        return (enc(v).todense() ** 2).sum()

    g = jax.grad(f)(values)
    assert g.shape == values.shape
    assert np.isfinite(np.asarray(g)).all()


def test_encoder_validation(key):
    enc = PairwiseEncoder(1.0, (1, 4, 4))
    with pytest.raises(ValueError, match="dimensions"):
        enc(jnp.ones((3, 4)))
    with pytest.raises(ValueError, match="Spatial dimensions"):
        enc(jnp.ones((len(enc.offsets), 1, 5, 5)))
    with pytest.raises(ValueError, match="number of offsets"):
        enc(jnp.ones((len(enc.offsets) + 1, 1, 4, 4)))
    with pytest.raises(ValueError, match="layout"):
        PairwiseEncoder(1.0, (1, 4, 4), layout="bsr")
    with pytest.raises(DeprecationWarning):
        import warnings as w
        with w.catch_warnings():
            w.simplefilter("error")
            PairwiseVoxelEncoder(1.0, (1, 3, 3, 3))


def test_integration_encoder_mvn_backward(key):
    """encoder -> lower-tri factor -> SparseMultivariateNormal -> rsample
    -> loss -> grads on the encoder input values (reference
    test_integration_pairwise_sparse_mvn.py:402-787)."""
    vol = (1, 4, 4)
    enc = PairwiseEncoder(1.0, vol, diag=False, upper=False, layout="csr")
    n = enc.volume_numel
    kv, kd, ks = jax.random.split(key, 3)
    values = 0.1 * jax.random.normal(kv, (len(enc.offsets),) + vol)
    diagonal = jnp.exp(0.2 * jax.random.normal(kd, (n,)))

    def loss(values, diagonal, loc):
        L = enc(values)  # strictly lower triangular (upper=False keeps
        # offsets with positive first non-zero => row > col)
        dist = SparseMultivariateNormal(loc, diagonal, scale_tril=L)
        s = dist.rsample(ks, (64,))
        return (s ** 2).mean()

    loc = jnp.zeros(n)
    val = loss(values, diagonal, loc)
    assert np.isfinite(float(val))
    g_v, g_d, g_l = jax.grad(loss, argnums=(0, 1, 2))(values, diagonal, loc)
    assert g_v.shape == values.shape
    assert np.isfinite(np.asarray(g_v)).all()
    assert np.isfinite(np.asarray(g_d)).all()
    # optimization smoke: a few steps reduce the loss
    v, d = values, diagonal
    l0 = loss(v, d, loc)
    for _ in range(3):
        gv, gd = jax.grad(loss, argnums=(0, 1))(v, d, loc)
        v = v - 0.1 * gv
        d = d - 0.1 * gd
    assert loss(v, d, loc) < l0


def test_integration_stability_iterations(key):
    """5 repeated build->sample cycles stay finite (reference stability
    archetype)."""
    enc = PairwiseEncoder(1.0, (1, 3, 3), diag=False, upper=False)
    n = enc.volume_numel
    values = 0.1 * jax.random.normal(key, (len(enc.offsets), 1, 3, 3))
    for i in range(5):
        L = enc(values)
        dist = SparseMultivariateNormal(jnp.zeros(n), jnp.ones(n),
                                        scale_tril=L)
        s = dist.rsample(jax.random.fold_in(key, i), (16,))
        assert np.isfinite(np.asarray(s)).all()
