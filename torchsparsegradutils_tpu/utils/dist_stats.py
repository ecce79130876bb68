"""Statistical validation helpers: Hotelling T² and Nagao tests.

Rebuild of the reference's
``/root/reference/torchsparsegradutils/utils/dist_stats_helpers.py``:
confidence-region (not p-value) semantics (:11-47), batched ``(B, p)`` /
``(B, p, p)`` inputs, scipy-distribution critical values.

* ``mean_hotelling_t2_test`` (:72-217):
  ``T² = n (x̄−μ₀)ᵀ Σ̂⁻¹ (x̄−μ₀)`` accepted iff
  ``T² ≤ p(n−1)/(n−p) · F_{p,n−p;level}``.
* ``cov_nagao_test`` (:220-373): whiten by the Cholesky of the reference
  covariance, ``T_N = (n/2)‖W − I‖²_F`` accepted iff
  ``T_N ≤ χ²_{p(p+1)/2;level}``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from scipy.stats import chi2 as _chi2
from scipy.stats import f as _f

__all__ = ["mean_hotelling_t2_test", "cov_nagao_test", "sample_mean_cov"]


def _ensure_batched(x, want_ndim: int):
    x = jnp.asarray(x)
    if x.ndim == want_ndim - 1:
        return x[None], True
    if x.ndim == want_ndim:
        return x, False
    raise ValueError(f"expected {want_ndim - 1}-D or {want_ndim}-D input, "
                     f"got {x.ndim}-D")


def sample_mean_cov(samples) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unbiased sample mean/covariance over axis 0: samples ``(n, ..., p)``
    -> ``((..., p), (..., p, p))``."""
    samples = jnp.asarray(samples)
    n = samples.shape[0]
    mean = samples.mean(axis=0)
    centered = samples - mean
    cov = jnp.einsum("n...i,n...j->...ij", centered, centered) / (n - 1)
    return mean, cov


def mean_hotelling_t2_test(sample_mean, true_mean, sample_cov, n: int,
                           confidence_level: float = 0.95):
    """One-sample Hotelling T² confidence-region test for the mean.

    Args:
      sample_mean, true_mean: ``(p,)`` or ``(B, p)``.
      sample_cov: ``(p, p)`` or ``(B, p, p)``.
      n: number of samples behind ``sample_mean``/``sample_cov``.

    Returns:
      ``(accepted, t2_statistic, threshold)`` — boolean mask ``(B,)``,
      statistic ``(B,)``, and the scalar critical value.
    """
    sm, squeezed = _ensure_batched(sample_mean, 2)
    tm, _ = _ensure_batched(true_mean, 2)
    sc, _ = _ensure_batched(sample_cov, 3)
    B, p = sm.shape
    if n <= p:
        raise ValueError(f"Hotelling T² requires n > p (got n={n}, p={p})")
    diff = sm - tm
    sol = jnp.linalg.solve(sc, diff[..., None])[..., 0]
    t2 = n * jnp.einsum("bi,bi->b", diff, sol)
    f_crit = float(_f.ppf(confidence_level, dfn=p, dfd=n - p))
    threshold = (p * (n - 1) / (n - p)) * f_crit
    accepted = t2 <= threshold
    if squeezed:
        accepted, t2 = accepted[0], t2[0]
    return accepted, t2, threshold


def cov_nagao_test(emp_cov, ref_cov, n: int,
                   confidence_level: float = 0.95):
    """Nagao (1973) one-sample confidence-region test for the covariance.

    Args:
      emp_cov, ref_cov: ``(p, p)`` or ``(B, p, p)``.
      n: number of samples behind ``emp_cov``.

    Returns:
      ``(accepted, t_n_statistic, threshold)``.
    """
    ec, squeezed = _ensure_batched(emp_cov, 3)
    rc, _ = _ensure_batched(ref_cov, 3)
    B, p, _ = ec.shape
    L = jnp.linalg.cholesky(rc)
    invL = jnp.linalg.inv(L)
    W = invL @ ec @ jnp.swapaxes(invL, -1, -2)
    diff = W - jnp.eye(p, dtype=ec.dtype)
    t_n = (n / 2.0) * jnp.sum(diff * diff, axis=(-2, -1))
    nu = 0.5 * p * (p + 1)
    threshold = float(_chi2.ppf(confidence_level, df=nu))
    accepted = t_n <= threshold
    if squeezed:
        accepted, t_n = accepted[0], t_n[0]
    return accepted, t_n, threshold
