"""Large-event integration: encoder -> sparse factor -> MVN -> backward
at a 16k-dimensional event space (reference archetype:
test_integration_pairwise_sparse_mvn.py's 55k-dim CUDA configs, scaled
to what the 8-virtual-device CPU suite can run)."""

import jax
import jax.numpy as jnp
import numpy as np

from torchsparsegradutils_tpu.models import (PairwiseEncoder,
                                             SparseMultivariateNormal)


def test_large_event_mvn_roundtrip(key):
    enc = PairwiseEncoder(radius=1.0, volume_shape=(1, 128, 128),
                          upper=False)
    n = enc.volume_numel
    assert n == 16384
    values = 0.05 * jax.random.normal(key,
                                      (len(enc.offsets),) + enc.volume_shape)
    L = enc(values)
    assert L.shape == (n, n)
    dist = SparseMultivariateNormal(jnp.zeros(n), jnp.ones(n),
                                    precision_tril=L)
    s = dist.rsample(jax.random.fold_in(key, 1), (4,))
    assert s.shape == (4, n)
    assert np.isfinite(np.asarray(s)).all()
    lp = dist.log_prob(s)
    assert np.isfinite(np.asarray(lp)).all()

    def loss(v):
        d = SparseMultivariateNormal(jnp.zeros(n), jnp.ones(n),
                                     precision_tril=enc(v))
        return -d.log_prob(s).mean()

    g = jax.grad(loss)(values)
    assert g.shape == values.shape
    assert np.isfinite(np.asarray(g)).all()
