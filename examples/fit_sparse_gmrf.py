"""Example: fit a sparse Gaussian Markov random field to spatial data.

End-to-end walk through the library's integration path (the reference's
headline workflow, SURVEY §3.5): a :class:`PairwiseEncoder` builds the
neighborhood sparsity pattern of a 2-D image grid, the encoder output
parameterises a :class:`SparseMultivariateNormal` in the precision-LDLᵀ
form, and we maximise the exact sparse log-likelihood of observed samples
with optax — gradients flow to the encoder's per-offset value maps through
the sparse kernels.

Run (CPU or TPU):  python -m examples.fit_sparse_gmrf
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchsparsegradutils_tpu.models import (
    PairwiseEncoder,
    SparseMultivariateNormal,
)


def make_ground_truth(key, enc: PairwiseEncoder):
    """A random (but valid) sparse-precision Gaussian over the grid."""
    n = enc.volume_numel
    kv, kd = jax.random.split(key)
    values = 0.3 * jax.random.normal(kv, (len(enc.offsets),)
                                     + enc.volume_shape)
    log_diag = 0.2 * jax.random.normal(kd, (n,))
    return {"values": values, "log_diag": log_diag,
            "loc": jnp.zeros((n,))}


def dist_from(params, enc: PairwiseEncoder) -> SparseMultivariateNormal:
    L = enc(params["values"])  # strictly-lower factor
    return SparseMultivariateNormal(params["loc"],
                                    jnp.exp(params["log_diag"]),
                                    precision_tril=L)


def main():
    key = jax.random.PRNGKey(0)
    enc = PairwiseEncoder(radius=1.5, volume_shape=(1, 16, 16),
                          diag=False, upper=False, layout="coo")
    n = enc.volume_numel
    print(f"grid {enc.volume_shape}, event dim {n}, "
          f"{len(enc.offsets)} offsets, pattern nnz {enc.nnz}")

    # --- synthetic data from a ground-truth model
    truth = make_ground_truth(jax.random.fold_in(key, 1), enc)
    data = dist_from(truth, enc).rsample(jax.random.fold_in(key, 2),
                                         (4096,))
    print(f"observations: {data.shape}")

    # --- maximum likelihood with optax
    params = {"values": jnp.zeros_like(truth["values"]),
              "log_diag": jnp.zeros((n,)), "loc": jnp.zeros((n,))}
    opt = optax.adam(3e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def nll(p):
            return -dist_from(p, enc).log_prob(batch).mean()

        loss, grads = jax.value_and_grad(nll)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    truth_nll = float(-dist_from(truth, enc).log_prob(data).mean())
    for i in range(300):
        params, opt_state, loss = step(params, opt_state, data)
        if i % 50 == 0 or i == 299:
            print(f"step {i:4d}  nll {float(loss):9.3f}   "
                  f"(ground truth {truth_nll:9.3f})")

    final = float(step(params, opt_state, data)[2])
    assert final < truth_nll + 0.15 * abs(truth_nll) + 5.0, (
        "did not approach the ground-truth likelihood")
    print("fitted within tolerance of the ground-truth likelihood")


if __name__ == "__main__":
    main()
