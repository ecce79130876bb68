"""Sparse-factor multivariate normal distributions.

TPU-native rebuild of the reference's
``/root/reference/torchsparsegradutils/distributions/
sparse_multivariate_normal.py``:

* ``SparseMultivariateNormal`` (:105-389) — mean + sparse lower-triangular
  factor of either the covariance (``scale_tril``) or the precision
  (``precision_tril``), each in Cholesky (LLᵀ, diagonal stored in the
  factor) or modified-Cholesky (LDLᵀ, separate positive ``diagonal``, factor
  strictly lower / implicitly unit) form; one optional batch dim;
  reparameterised sampling:
    - cov-LLᵀ:   ``x = μ + L ε``                      (:365, via sparse_mm)
    - cov-LDLᵀ:  ``x = μ + (I + L)(√D ε)``            (:358-362)
    - prec-LLᵀ:  ``x = μ + L⁻ᵀ ε``                    (:379-387, transpose
      triangular solve)
    - prec-LDLᵀ: ``x = μ + L⁻ᵀ(ε/√D)``                (:369-377, unit
      transpose triangular solve)
  Samples ride the RHS column axis of one 2-D sparse op (:16-102), so a
  single SpMM/solve serves the whole sample batch.

* ``SparseMultivariateNormalNative`` (:392-589) — minimal CSR-only,
  unbatched, cov-LLᵀ variant built on the raw SpMM, with densifying
  ``covariance_matrix`` / ``variance`` / ``log_prob`` (with warnings).

JAX-idiomatic differences: sampling takes an explicit PRNG ``key``; and —
beyond the reference — ``SparseMultivariateNormal.log_prob`` is provided
**exactly and sparsely** for all four parameterizations (quadratic forms
via SpMM / triangular solve; log-determinants from the factor diagonal),
where the reference only offers a densifying log_prob on the Native class.

Example:
    >>> import jax, jax.numpy as jnp
    >>> from torchsparsegradutils_tpu.models import SparseMultivariateNormal
    >>> from torchsparsegradutils_tpu.utils import rand_sparse_tri
    >>> L = rand_sparse_tri(jax.random.PRNGKey(0), (8, 8), 20, upper=False,
    ...                     well_conditioned=True)
    >>> d = SparseMultivariateNormal(jnp.zeros(8), scale_tril=L)
    >>> s = d.rsample(jax.random.PRNGKey(1), (5,))
    >>> s.shape
    (5, 8)
"""

from __future__ import annotations

import math
import warnings
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spmm import sparse_mm
from ..ops.triangular_solve import sparse_triangular_solve
from ..types import SparseCOO, SparseCSR, is_sparse

__all__ = ["SparseMultivariateNormal", "SparseMultivariateNormalNative"]


def _check_tril(factor, strict: bool, what: str):
    """Host-side triangularity check (static patterns)."""
    try:
        r = factor.rows_np(what)
        c = factor.cols_np(what)
    except ValueError:
        return  # dynamic pattern: trust the caller
    if strict:
        if not (c < r).all():
            raise ValueError(
                f"{what}: LDLᵀ factor must be strictly lower-triangular "
                "(no diagonal entries; the diagonal is passed separately)")
    else:
        if not (c <= r).all():
            raise ValueError(f"{what}: factor must be lower-triangular")


def _diag_positions(factor) -> np.ndarray:
    """Indices into data of the n diagonal entries (host-side, static)."""
    r = factor.rows_np("log_prob")
    c = factor.cols_np("log_prob")
    if r.ndim != 1:
        raise ValueError("per-element batched patterns are not supported "
                         "for log_prob; use a shared pattern")
    sel = np.nonzero(r == c)[0]
    n = factor.shape[-1]
    if len(sel) != n:
        raise ValueError(
            f"LLᵀ factor must store all {n} diagonal entries (found "
            f"{len(sel)}); missing diagonal entries make the factor "
            "singular")
    order = np.argsort(r[sel])
    return sel[order]


class SparseMultivariateNormal:
    """Multivariate normal with sparse Cholesky / LDLᵀ factor.

    Args:
      loc: mean, ``(n,)`` or ``(B, n)``.
      diagonal: optional ``(n,)`` / ``(B, n)`` diagonal of D — passing it
        selects the LDLᵀ parameterization (factor strictly lower, unit
        diagonal implied).  Must be positive for the covariance form.
      scale_tril: sparse lower-triangular covariance factor (exclusive with
        ``precision_tril``), shape ``(n, n)`` or ``(B, n, n)``.
      precision_tril: sparse lower-triangular precision factor.
    """

    def __init__(self, loc, diagonal=None, scale_tril=None,
                 precision_tril=None):
        if (scale_tril is None) == (precision_tril is None):
            raise ValueError(
                "exactly one of scale_tril or precision_tril must be given")
        factor = scale_tril if scale_tril is not None else precision_tril
        if not is_sparse(factor):
            raise TypeError("the triangular factor must be a SparseCOO or "
                            "SparseCSR container")
        if factor.ndim not in (2, 3):
            raise ValueError("the factor must be (n, n) or batched "
                             "(B, n, n)")
        if factor.shape[-1] != factor.shape[-2]:
            raise ValueError("the factor must be square")
        loc = jnp.asarray(loc) if not isinstance(loc, jax.core.Tracer) else loc
        n = factor.shape[-1]
        if loc.shape[-1] != n:
            raise ValueError(f"loc event dim {loc.shape[-1]} != factor dim "
                             f"{n}")
        if factor.ndim == 3:
            if loc.ndim == 1:
                loc = jnp.broadcast_to(loc, (factor.shape[0], n))
            if loc.shape[0] != factor.shape[0]:
                raise ValueError("loc batch dim does not match the factor")
        elif loc.ndim not in (1, 2):
            raise ValueError("loc must be (n,) or (B, n)")
        self._is_cov = scale_tril is not None
        self._is_ldlt = diagonal is not None
        if self._is_ldlt:
            diagonal = jnp.asarray(diagonal)
            if diagonal.shape != loc.shape and diagonal.shape != (n,):
                raise ValueError(
                    f"diagonal shape {diagonal.shape} incompatible with "
                    f"loc shape {loc.shape}")
        _check_tril(factor, strict=self._is_ldlt,
                    what="SparseMultivariateNormal")
        self.loc = loc
        self.diagonal = diagonal
        self.factor = factor

    # ------------------------------------------------------------- properties
    @property
    def is_ldlt_parameterization(self) -> bool:
        return self._is_ldlt

    @property
    def is_covariance_parameterization(self) -> bool:
        return self._is_cov

    @property
    def scale_tril(self):
        return self.factor if self._is_cov else None

    @property
    def precision_tril(self):
        return None if self._is_cov else self.factor

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.factor.shape[-1],)

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.factor.shape[:-2] if self.factor.ndim == 3 else \
            (self.loc.shape[:-1] if self.loc.ndim > 1 else ())

    @property
    def mean(self):
        return self.loc

    # --------------------------------------------------------------- sampling
    def rsample(self, key, sample_shape: Tuple[int, ...] = ()):
        """Reparameterised sample of shape ``sample_shape + batch + (n,)``.

        Gradients flow to ``loc``, ``diagonal`` and the factor's ``data``.
        """
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        n = self.factor.shape[-1]
        batched = self.factor.ndim == 3 or self.loc.ndim == 2
        bshape = (self.loc.shape[0],) if self.loc.ndim == 2 else ()
        S = int(np.prod(sample_shape)) if sample_shape else 1
        eps = jax.random.normal(key, (S,) + bshape + (n,), self.loc.dtype)
        x = self._transform_eps(eps)
        out = self.loc + x
        return out.reshape(sample_shape + bshape + (n,)) if sample_shape \
            else out[0]

    def sample(self, key, sample_shape: Tuple[int, ...] = ()):
        return jax.lax.stop_gradient(self.rsample(key, sample_shape))

    def _transform_eps(self, eps):
        """eps (S, *B, n) -> centred samples of the same shape, carried on
        the RHS column axis of one sparse op."""
        L = self.factor
        batched_factor = L.ndim == 3
        batched = eps.ndim == 3
        if batched:
            E = jnp.moveaxis(eps, 0, -1)           # (B, n, S)
        else:
            E = eps.T                               # (n, S)
        D = self.diagonal
        if D is not None:
            sqrtD = jnp.sqrt(D) if self._is_cov else jnp.sqrt(D)
            sqrtD_col = sqrtD[..., :, None]
        if self._is_cov:
            if self._is_ldlt:
                eta = sqrtD_col * E
                X = sparse_mm(L, eta) + eta
            else:
                X = sparse_mm(L, E)
        else:
            if self._is_ldlt:
                X = sparse_triangular_solve(L, E / sqrtD_col, upper=False,
                                            unitriangular=True,
                                            transpose=True)
            else:
                X = sparse_triangular_solve(L, E, upper=False,
                                            transpose=True)
        if batched:
            return jnp.moveaxis(X, -1, 0)
        return X.T

    # --------------------------------------------------------------- log_prob
    def log_prob(self, value):
        """Exact log density, computed sparsely (no densification).

        value: ``(..., n)`` (broadcast over leading sample dims; batched
        distributions expect ``(..., B, n)``).
        """
        n = self.factor.shape[-1]
        loc = self.loc
        delta = value - loc
        batched = loc.ndim == 2
        # flatten sample dims, carry on columns
        lead = delta.shape[:-1 - (1 if batched else 0)]
        S = int(np.prod(lead)) if lead else 1
        if batched:
            B = loc.shape[0]
            Dl = delta.reshape((S, B, n))
            E = jnp.moveaxis(Dl, 0, -1)            # (B, n, S)
        else:
            E = delta.reshape((S, n)).T            # (n, S)
        L = self.factor
        if self._is_cov:
            if self._is_ldlt:
                z = sparse_triangular_solve(L, E, upper=False,
                                            unitriangular=True)
                quad = (z * z / self.diagonal[..., :, None]).sum(-2)
                logdet_sigma = jnp.log(self.diagonal).sum(-1)
            else:
                z = sparse_triangular_solve(L, E, upper=False)
                quad = (z * z).sum(-2)
                dvals = self._factor_diag()
                logdet_sigma = 2.0 * jnp.log(jnp.abs(dvals)).sum(-1)
        else:
            if self._is_ldlt:
                y = E + sparse_mm(L.T, E)          # Lᵀ delta (unit L)
                quad = (self.diagonal[..., :, None] * y * y).sum(-2)
                logdet_sigma = -jnp.log(self.diagonal).sum(-1)
            else:
                y = sparse_mm(L.T, E)
                quad = (y * y).sum(-2)
                dvals = self._factor_diag()
                logdet_sigma = -2.0 * jnp.log(jnp.abs(dvals)).sum(-1)
        # quad: (S,) or (B, S)
        if batched:
            quad = jnp.moveaxis(quad, -1, 0)       # (S, B)
        lp = -0.5 * (quad + n * math.log(2.0 * math.pi)) - 0.5 * logdet_sigma
        shape = lead + ((loc.shape[0],) if batched else ())
        return lp.reshape(shape) if shape else lp.reshape(())

    def _factor_diag(self):
        sel = jnp.asarray(_diag_positions(self.factor))
        return jnp.take(self.factor.data, sel, axis=-1)


class SparseMultivariateNormalNative:
    """Minimal cov-LLᵀ variant on the raw SpMM (reference :392-589):
    unbatched, no LDLᵀ, with densifying covariance/variance helpers."""

    def __init__(self, loc, scale_tril):
        if not is_sparse(scale_tril):
            raise TypeError("scale_tril must be a sparse container")
        if scale_tril.ndim != 2:
            raise ValueError("SparseMultivariateNormalNative is unbatched")
        _check_tril(scale_tril, strict=False, what="scale_tril")
        self.loc = jnp.asarray(loc)
        self.scale_tril = scale_tril

    def rsample(self, key, sample_shape: Tuple[int, ...] = ()):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        n = self.scale_tril.shape[-1]
        S = int(np.prod(sample_shape)) if sample_shape else 1
        eps = jax.random.normal(key, (S, n), self.loc.dtype)
        x = sparse_mm(self.scale_tril, eps.T).T + self.loc
        return x.reshape(sample_shape + (n,)) if sample_shape else x[0]

    def covariance_matrix(self):
        warnings.warn("covariance_matrix densifies the sparse factor",
                      UserWarning, stacklevel=2)
        Ld = self.scale_tril.todense()
        return Ld @ Ld.T

    def variance(self):
        warnings.warn("variance densifies the sparse factor", UserWarning,
                      stacklevel=2)
        Ld = self.scale_tril.todense()
        return (Ld * Ld).sum(-1)

    def log_prob(self, value):
        warnings.warn("log_prob densifies the sparse factor", UserWarning,
                      stacklevel=2)
        cov = self.covariance_matrix()
        n = cov.shape[-1]
        delta = value - self.loc
        sol = jnp.linalg.solve(cov, delta[..., None])[..., 0]
        quad = (delta * sol).sum(-1)
        _, logdet = jnp.linalg.slogdet(cov)
        return -0.5 * (quad + n * math.log(2 * math.pi) + logdet)
