"""Full-covariance multivariate Gaussian exponential family (SURVEY.md §9.3).

Information-form convention used throughout svax: a Gaussian potential is a
pair ``(h, J)`` with precision ``J = Σ⁻¹`` and linear term ``h = Σ⁻¹ μ``, so
``log N(z) = hᵀz − ½ zᵀJz − A(h, J)`` with

    A(h, J) = ½ hᵀ J⁻¹ h − ½ log|J| + (d/2) log 2π .

This is the quantity the SIN combine (SURVEY.md §9.4) manipulates: adding
potentials multiplies Gaussians, and responsibility weights are log-partition
differences. All solves route through ``svax.ops.batched_linalg`` so the
(N, K) combine stays on the VPU with unrolled static-d recurrences.

Reference counterpart: recalled ``distributions/gaussian.py`` (unverified —
empty mount, SURVEY.md §0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svax.ops import batched_linalg as bl

_LOG_2PI = 1.8378770664093453


class GaussianNat(NamedTuple):
    """Natural/information parameters of a Gaussian: h = Σ⁻¹μ, prec = Σ⁻¹."""

    h: jnp.ndarray  # (..., d)
    prec: jnp.ndarray  # (..., d, d)


def standard_to_natural(mean: jnp.ndarray, cov: jnp.ndarray) -> GaussianNat:
    """(μ, Σ) → (h, J). Uses a Cholesky solve, no explicit inverse."""
    chol = bl.cholesky(cov)
    prec = bl.inv_psd(chol)
    h = bl.cho_solve_vec(chol, mean)
    return GaussianNat(h=h, prec=prec)


def natural_to_standard(nat: GaussianNat) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(h, J) → (μ, Σ)."""
    chol = bl.cholesky(nat.prec)
    cov = bl.inv_psd(chol)
    mean = bl.cho_solve_vec(chol, nat.h)
    return mean, cov


def log_partition(nat: GaussianNat) -> jnp.ndarray:
    """A(h, J) = ½ hᵀJ⁻¹h − ½ log|J| + (d/2) log 2π, batched over leading axes."""
    d = nat.h.shape[-1]
    chol = bl.cholesky(nat.prec)
    half_quad = 0.5 * jnp.sum(nat.h * bl.cho_solve_vec(chol, nat.h), axis=-1)
    return half_quad - 0.5 * bl.logdet_from_chol(chol) + 0.5 * d * _LOG_2PI


def log_prob(nat: GaussianNat, x: jnp.ndarray) -> jnp.ndarray:
    """log N(x | μ(h,J), Σ(h,J)) for x with shape (..., d)."""
    quad = jnp.einsum(
        "...i,...ij,...j->...", x, nat.prec, x, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.sum(nat.h * x, axis=-1) - 0.5 * quad - log_partition(nat)


def sample_from_precision(
    key: jax.Array, mean: jnp.ndarray, prec_chol: jnp.ndarray, shape_prefix: tuple = ()
) -> jnp.ndarray:
    """Reparameterized sample z = μ + L⁻ᵀ ε given L = chol(J) (Σ = L⁻ᵀL⁻¹).

    ``shape_prefix`` prepends sample axes (e.g. S Monte-Carlo draws). The
    backsolve is the unrolled static-d triangular solve, so gradients flow
    through both μ and L (SURVEY.md §9.6 reparameterization path).
    """
    eps = jax.random.normal(
        key, shape_prefix + mean.shape, dtype=mean.dtype
    )
    return mean + bl.solve_triu_vec(jnp.broadcast_to(prec_chol, shape_prefix + prec_chol.shape), eps)


def expected_stats(mean: jnp.ndarray, cov: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """E[z] = μ and E[zzᵀ] = Σ + μμᵀ (the CVI suff-stat moments, §9.5)."""
    outer = mean[..., :, None] * mean[..., None, :]
    return mean, cov + outer


def kl(q: GaussianNat, p: GaussianNat) -> jnp.ndarray:
    """KL(q ‖ p) between Gaussians in information form (Bregman form).

    With true naturals λ = (h, −½J) against T = (z, zzᵀ):
    KL = ⟨h_q − h_p, μ_q⟩ − ½⟨J_q − J_p, Σ_q + μ_qμ_qᵀ⟩ − A(q) + A(p).
    """
    mean_q, cov_q = natural_to_standard(q)
    ezz = cov_q + mean_q[..., :, None] * mean_q[..., None, :]
    inner = jnp.sum((q.h - p.h) * mean_q, axis=-1) - 0.5 * jnp.sum(
        (q.prec - p.prec) * ezz, axis=(-2, -1)
    )
    return inner - log_partition(q) + log_partition(p)
