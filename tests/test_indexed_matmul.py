"""segment_mm / gather_mm tests vs naive loops, grads, jit (mirrors
reference tests/test_indexed_matmul.py archetypes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu import gather_mm, segment_mm


def test_segment_mm(key):
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (10, 4))
    b = jax.random.normal(kb, (3, 4, 5))
    seglen = jnp.array([3, 0, 7])
    out = segment_mm(a, b, seglen)
    ref = jnp.concatenate([a[0:3] @ b[0], a[3:3] @ b[1], a[3:10] @ b[2]])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_segment_mm_grad(key):
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (6, 3))
    b = jax.random.normal(kb, (2, 3, 4))
    seglen = jnp.array([2, 4])

    def f(a, b):
        return (segment_mm(a, b, seglen) ** 2).sum()

    def f_ref(a, b):
        out = jnp.concatenate([a[:2] @ b[0], a[2:] @ b[1]])
        return (out ** 2).sum()

    gs = jax.grad(f, argnums=(0, 1))(a, b)
    gr = jax.grad(f_ref, argnums=(0, 1))(a, b)
    for x, y in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-6)


def test_gather_mm(key):
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (8, 4))
    b = jax.random.normal(kb, (3, 4, 5))
    idx = jnp.array([2, 0, 1, 1, 2, 0, 0, 2])
    out = gather_mm(a, b, idx)
    ref = jnp.stack([a[i] @ b[int(idx[i])] for i in range(8)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_gather_mm_grad_jit(key):
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (8, 4))
    b = jax.random.normal(kb, (3, 4, 5))
    idx = jnp.array([2, 0, 1, 1, 2, 0, 0, 2])

    f = jax.jit(lambda a, b: (gather_mm(a, b, idx) ** 2).sum())
    ga, gb = jax.grad(f, argnums=(0, 1))(a, b)

    def f_ref(a, b):
        out = jnp.stack([a[i] @ b[idx[i]] for i in range(8)])
        return (out ** 2).sum()

    ra, rb = jax.grad(f_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-5,
                               atol=1e-6)


def test_validation(key):
    a = jnp.ones((4, 3))
    b = jnp.ones((2, 3, 5))
    with pytest.raises(ValueError, match="a must be 2-D"):
        segment_mm(jnp.ones(4), b, jnp.array([2, 2]))
    with pytest.raises(ValueError, match="b must be 3-D"):
        segment_mm(a, jnp.ones((3, 5)), jnp.array([2, 2]))
    with pytest.raises(ValueError, match="inner dims"):
        segment_mm(a, jnp.ones((2, 4, 5)), jnp.array([2, 2]))
    with pytest.raises(ValueError, match="seglen_a"):
        segment_mm(a, b, jnp.array([2, 1, 1]))
    with pytest.raises(ValueError, match="idx_b"):
        gather_mm(a, b, jnp.array([0, 1]))
    with pytest.raises(ValueError, match="integer"):
        gather_mm(a, b, jnp.zeros(4))
