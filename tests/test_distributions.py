"""SparseMultivariateNormal tests: statistical validation via Hotelling T²
(mean) + Nagao (covariance) on 10k rsamples vs the analytically
reconstructed covariance, all four parameterizations; log_prob vs dense;
grad flow (mirrors reference tests/test_distributions.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsparsegradutils_tpu.models import (
    SparseMultivariateNormal,
    SparseMultivariateNormalNative,
)
from torchsparsegradutils_tpu.utils import rand_sparse_tri
from torchsparsegradutils_tpu.utils.dist_stats import (
    cov_nagao_test,
    mean_hotelling_t2_test,
    sample_mean_cov,
)

from test_config import LAYOUTS

N = 12
NS = 20000


@pytest.fixture(params=LAYOUTS)
def layout(request):
    return request.param


def _factor(key, layout, strict):
    L = rand_sparse_tri(key, (N, N), (N if not strict else 0) + 14,
                        upper=False, strict=strict, layout=layout)
    # moderate off-diagonal magnitudes for well-conditioned covariances
    return L.with_data(jnp.clip(L.data, -2.0, 2.0))


def _ref_cov(dist):
    Ld = np.asarray(dist.factor.todense())
    n = Ld.shape[-1]
    if dist.is_ldlt_parameterization:
        D = np.diag(np.asarray(dist.diagonal))
        Lu = Ld + np.eye(n)
        M = Lu @ D @ Lu.T
    else:
        M = Ld @ Ld.T
    if dist.is_covariance_parameterization:
        return M
    return np.linalg.inv(M)


def _params(key, layout, cov: bool, ldlt: bool):
    kL, kD, kM = jax.random.split(key, 3)
    L = _factor(kL, layout, strict=ldlt)
    loc = jax.random.normal(kM, (N,))
    diagonal = jnp.exp(0.3 * jax.random.normal(kD, (N,))) if ldlt else None
    if cov:
        return SparseMultivariateNormal(loc, diagonal, scale_tril=L)
    return SparseMultivariateNormal(loc, diagonal, precision_tril=L)


@pytest.mark.parametrize("cov", [True, False])
@pytest.mark.parametrize("ldlt", [True, False])
def test_rsample_statistics(key, layout, cov, ldlt):
    dist = _params(key, layout, cov, ldlt)
    samples = dist.rsample(jax.random.fold_in(key, 9), (NS,))
    assert samples.shape == (NS, N)
    mean, emp_cov = sample_mean_cov(samples)
    ref_cov = _ref_cov(dist)
    ok_mean, t2, thr = mean_hotelling_t2_test(mean, dist.loc,
                                              jnp.asarray(emp_cov), NS,
                                              confidence_level=0.999)
    assert bool(ok_mean), f"T2={float(t2):.2f} > {thr:.2f}"
    ok_cov, tn, thr_c = cov_nagao_test(jnp.asarray(emp_cov),
                                       jnp.asarray(ref_cov), NS,
                                       confidence_level=0.999)
    assert bool(ok_cov), f"T_N={float(tn):.2f} > {thr_c:.2f}"


def test_rsample_batched(key, layout):
    kL, kM = jax.random.split(key)
    L = rand_sparse_tri(kL, (3, N, N), N + 10, upper=False, layout=layout,
                        shared_pattern=True)
    loc = jax.random.normal(kM, (3, N))
    dist = SparseMultivariateNormal(loc, scale_tril=L)
    s = dist.rsample(jax.random.fold_in(key, 1), (7,))
    assert s.shape == (7, 3, N)
    # statistics of one batch element
    s2 = dist.rsample(jax.random.fold_in(key, 2), (NS,))
    mean, emp_cov = sample_mean_cov(s2)
    Ld = np.asarray(L.todense())
    for b in range(3):
        ok, *_ = cov_nagao_test(jnp.asarray(emp_cov[b]),
                                jnp.asarray(Ld[b] @ Ld[b].T), NS,
                                confidence_level=0.999)
        assert bool(ok)


@pytest.mark.parametrize("cov", [True, False])
@pytest.mark.parametrize("ldlt", [True, False])
def test_log_prob_vs_dense(key, layout, cov, ldlt):
    dist = _params(key, layout, cov, ldlt)
    x = dist.rsample(jax.random.fold_in(key, 5), (6,))
    lp = dist.log_prob(x)
    assert lp.shape == (6,)
    cov_mat = jnp.asarray(_ref_cov(dist))
    delta = x - dist.loc
    sol = jnp.linalg.solve(cov_mat, delta.T).T
    quad = (delta * sol).sum(-1)
    _, logdet = jnp.linalg.slogdet(cov_mat)
    ref = -0.5 * (quad + N * np.log(2 * np.pi) + logdet)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref), rtol=1e-3,
                               atol=1e-3)


def test_grad_flows_through_rsample(key, layout):
    dist0 = _params(key, layout, cov=True, ldlt=False)
    L = dist0.factor
    target = jax.random.normal(jax.random.fold_in(key, 2), (N,))

    def loss(data, loc):
        d = SparseMultivariateNormal(loc, scale_tril=L.with_data(data))
        s = d.rsample(jax.random.fold_in(key, 3), (32,))
        return ((s.mean(0) - target) ** 2).sum()

    gd, gl = jax.grad(loss, argnums=(0, 1))(L.data, dist0.loc)
    assert gd.shape == L.data.shape
    assert np.isfinite(np.asarray(gd)).all()
    assert np.abs(np.asarray(gl)).max() > 0


def test_optimization_smoke(key, layout):
    """Fit the factor diagonal to a target variance via rsample grads."""
    dist0 = _params(key, layout, cov=True, ldlt=False)
    L = dist0.factor

    def loss(data):
        d = SparseMultivariateNormal(jnp.zeros(N),
                                     scale_tril=L.with_data(data))
        s = d.rsample(jax.random.fold_in(key, 7), (256,))
        return ((s.var(0) - 1.0) ** 2).sum()

    data = L.data
    l0 = loss(data)
    for i in range(5):
        data = data - 0.05 * jax.grad(loss)(data)
    assert loss(data) < l0


def test_validation(key, layout):
    L = _factor(key, layout, strict=False)
    with pytest.raises(ValueError, match="exactly one"):
        SparseMultivariateNormal(jnp.zeros(N))
    with pytest.raises(ValueError, match="exactly one"):
        SparseMultivariateNormal(jnp.zeros(N), scale_tril=L,
                                 precision_tril=L)
    with pytest.raises(ValueError, match="strictly lower"):
        SparseMultivariateNormal(jnp.zeros(N), diagonal=jnp.ones(N),
                                 scale_tril=L)  # LDLT needs strict factor
    U = rand_sparse_tri(key, (N, N), N + 6, upper=True, layout=layout)
    with pytest.raises(ValueError, match="lower-triangular"):
        SparseMultivariateNormal(jnp.zeros(N), scale_tril=U)
    with pytest.raises(ValueError, match="event dim"):
        SparseMultivariateNormal(jnp.zeros(N + 1), scale_tril=L)


def test_native_variant(key, layout):
    L = _factor(key, layout, strict=False)
    dist = SparseMultivariateNormalNative(jnp.zeros(N), L)
    s = dist.rsample(key, (NS,))
    _, emp_cov = sample_mean_cov(s)
    with pytest.warns(UserWarning, match="densifies"):
        ref = dist.covariance_matrix()
    ok, *_ = cov_nagao_test(jnp.asarray(emp_cov), ref, NS,
                            confidence_level=0.999)
    assert bool(ok)
    with pytest.warns(UserWarning, match="densifies"):
        v = dist.variance()
    np.testing.assert_allclose(np.asarray(v), np.diag(np.asarray(ref)),
                               rtol=1e-5)
    with pytest.warns(UserWarning, match="densifies"):
        lp = dist.log_prob(s[:4])
    assert lp.shape == (4,)


def test_rank_dispatch_2d_factor_batched_loc(key, layout):
    """2-D shared factor with batched loc (reference _batch_sparse_mv rank
    dispatch, sparse_multivariate_normal.py:16-102)."""
    L = _factor(key, layout, strict=False)
    loc = jax.random.normal(jax.random.fold_in(key, 1), (5, N))
    dist = SparseMultivariateNormal(loc, scale_tril=L)
    s = dist.rsample(jax.random.fold_in(key, 2), (7,))
    assert s.shape == (7, 5, N)
    lp = dist.log_prob(s)
    assert lp.shape == (7, 5)
    assert np.isfinite(np.asarray(lp)).all()


def test_scalar_sample_shape(key, layout):
    dist = _params(key, layout, cov=True, ldlt=False)
    s = dist.rsample(jax.random.fold_in(key, 3))
    assert s.shape == (N,)
    s2 = dist.sample(jax.random.fold_in(key, 4), (3,))
    assert s2.shape == (3, N)
