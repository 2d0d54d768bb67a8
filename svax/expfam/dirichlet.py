"""Dirichlet exponential family over mixture weights π (SURVEY.md §9.1).

Natural parameter convention: ``η = α − 1`` (the reference's recalled
``dirichlet.py`` convention, SURVEY.md §3a). Sufficient statistic
``T(π) = log π``; log-partition ``A(η) = Σ lgamma(η+1) − lgamma(Σ(η+1))``,
whose gradient recovers ``E[log π]`` (tested).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln


def standard_to_natural(alpha: jnp.ndarray) -> jnp.ndarray:
    """α (…, K) → η = α − 1."""
    return alpha - 1.0


def natural_to_standard(nat: jnp.ndarray) -> jnp.ndarray:
    """η (…, K) → α = η + 1."""
    return nat + 1.0


def expected_log_pi(alpha: jnp.ndarray) -> jnp.ndarray:
    """E[log π_k] = ψ(α_k) − ψ(Σ_j α_j); alpha (…, K)."""
    return digamma(alpha) - digamma(jnp.sum(alpha, axis=-1, keepdims=True))


def log_partition(alpha: jnp.ndarray) -> jnp.ndarray:
    """A(α) = Σ_k lgamma(α_k) − lgamma(Σ_k α_k); reduces the trailing axis."""
    return jnp.sum(gammaln(alpha), axis=-1) - gammaln(jnp.sum(alpha, axis=-1))


def log_partition_nat(nat: jnp.ndarray) -> jnp.ndarray:
    """A(η) in natural parameters; ∇_η A = E[log π] (exp-family identity)."""
    return log_partition(natural_to_standard(nat))


def kl(alpha_q: jnp.ndarray, alpha_p: jnp.ndarray) -> jnp.ndarray:
    """KL(Dir(α_q) ‖ Dir(α_p)), closed form (SURVEY.md §9.1).

    Bregman form: ⟨α_q − α_p, E_q[log π]⟩ − A(α_q) + A(α_p).
    """
    elogpi = expected_log_pi(alpha_q)
    return (
        jnp.sum((alpha_q - alpha_p) * elogpi, axis=-1)
        - log_partition(alpha_q)
        + log_partition(alpha_p)
    )


def log_prob(alpha: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """log Dir(π | α) with π on the simplex along the trailing axis."""
    return jnp.sum((alpha - 1.0) * jnp.log(pi), axis=-1) - log_partition(alpha)


def sample(key, alpha: jnp.ndarray, shape: tuple = ()) -> jnp.ndarray:
    """Draw π ~ Dir(α); returns shape + alpha.shape."""
    import jax

    return jax.random.dirichlet(key, alpha, shape=shape + alpha.shape[:-1])
