"""Beta exponential family over Bernoulli success probabilities θ.

The conjugate pair for the Bernoulli-mixture baseline (the MNIST column of
the paper's three-model comparison, SURVEY.md §1/§3a "Pure-GMM baseline"
row generalized to the Bernoulli likelihood class). Beta is the K=2
Dirichlet; the module keeps the same shape conventions as
``svax.expfam.dirichlet`` with the (a, b) pair stacked on the trailing
axis, so the CVI machinery (η ← (1−ρ)η + ρ(η₀+Δ), svax/pgm/natgrad.py)
applies unchanged.

Natural parameter convention: ``η = (a−1, b−1)`` for Beta(a, b), matching
the Dirichlet's ``η = α − 1`` (SURVEY.md §9.1). Sufficient statistics of a
Bernoulli observation x under its conjugate update: ``(x, 1−x)``.
Log-partition ``A(a,b) = lgamma(a) + lgamma(b) − lgamma(a+b)`` whose
natural-parameter gradient recovers ``(E[log θ], E[log(1−θ)])`` — the
exp-family identity tests/test_bmm.py pins.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln


def standard_to_natural(ab: jnp.ndarray) -> jnp.ndarray:
    """(…, 2) stacked (a, b) → η = (a−1, b−1)."""
    return ab - 1.0


def natural_to_standard(nat: jnp.ndarray) -> jnp.ndarray:
    """η (…, 2) → (a, b) = η + 1."""
    return nat + 1.0


def expected_log_theta(ab: jnp.ndarray) -> jnp.ndarray:
    """(E[log θ], E[log(1−θ)]) stacked on the trailing axis.

    E[log θ] = ψ(a) − ψ(a+b); E[log(1−θ)] = ψ(b) − ψ(a+b).
    """
    return digamma(ab) - digamma(jnp.sum(ab, axis=-1, keepdims=True))


def mean(ab: jnp.ndarray) -> jnp.ndarray:
    """Posterior-predictive success probability E[θ] = a / (a+b)."""
    return ab[..., 0] / jnp.sum(ab, axis=-1)


def log_partition(ab: jnp.ndarray) -> jnp.ndarray:
    """A(a, b) = lgamma(a) + lgamma(b) − lgamma(a+b); reduces the pair axis."""
    return jnp.sum(gammaln(ab), axis=-1) - gammaln(jnp.sum(ab, axis=-1))


def log_partition_nat(nat: jnp.ndarray) -> jnp.ndarray:
    """A(η); ∇_η A = (E[log θ], E[log(1−θ)]) (exp-family identity)."""
    return log_partition(natural_to_standard(nat))


def kl(ab_q: jnp.ndarray, ab_p: jnp.ndarray) -> jnp.ndarray:
    """KL(Beta(a_q, b_q) ‖ Beta(a_p, b_p)), Bregman closed form."""
    elog = expected_log_theta(ab_q)
    return (
        jnp.sum((ab_q - ab_p) * elog, axis=-1)
        - log_partition(ab_q)
        + log_partition(ab_p)
    )


def log_prob(ab: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """log Beta(θ | a, b) for θ ∈ (0, 1)."""
    a, b = ab[..., 0], ab[..., 1]
    return (
        (a - 1.0) * jnp.log(theta)
        + (b - 1.0) * jnp.log1p(-theta)
        - log_partition(ab)
    )
