"""Bernoulli-mixture inference engine (Beta–Bernoulli conjugate CVI).

The MNIST column of the paper's three-model comparison (SURVEY.md §1) needs
a mixture baseline whose score is commensurable with the Bernoulli
decoders' log-MASS — a Gaussian-mixture density on binarized pixels is not
(runs/comparison.json round-4 dash). This module is that baseline: a
mixture of product-Bernoulli components with conjugate Dirichlet (weights)
and per-component-per-pixel Beta (success probabilities) priors, trained by
the SAME natural-gradient/CVI machinery as the GMM (SURVEY.md §9.5;
``svax.pgm.natgrad.cvi_update`` applies leaf-wise, unchanged).

Mirrors ``svax.pgm.gmm``'s structure one-for-one:

* ``BmmNat(dir_nat, beta_nat)`` — Dirichlet η (K,), Beta η (K, D, 2)
* E-step:  log r_nk = E[log π_k] + Σ_j x_j E[log θ_kj]
                                 + (1−x_j) E[log(1−θ_kj)]; softmax over k
* M-step stats: N_k = Σ r_nk, s_kj = Σ r_nk x_j, scaled N/M; the Beta
  natural increment is (s_kj, N_k − s_kj) — the psum point for DP
* exact posterior predictive: p(x*) = Σ_k E[π_k] Π_j BetaBern(x*_j)
  with E[π] = α/α₀ and per-pixel predictive E[θ] = a/(a+b) — exact under
  the factorized q, the Bernoulli analogue of the GMM's Student-t
  predictive (svax/models/evaluation.py::gmm_predictive_log_prob)

``x`` may be soft in [0, 1] during training (the E-step and stats are
linear in x), but the exact predictive is a log-MASS only for binary x.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svax.expfam import beta, dirichlet


class BmmNat(NamedTuple):
    dir_nat: jnp.ndarray  # (K,)    Dirichlet natural α−1
    beta_nat: jnp.ndarray  # (K, D, 2) Beta naturals (a−1, b−1)


class BmmExpected(NamedTuple):
    elog_pi: jnp.ndarray  # (K,)
    elog_theta: jnp.ndarray  # (K, D)   E[log θ]
    elog_1m_theta: jnp.ndarray  # (K, D)   E[log(1−θ)]


class BmmSuffStats(NamedTuple):
    counts: jnp.ndarray  # (K,)    Σ r
    s1: jnp.ndarray  # (K, D)  Σ r·x


def make_prior(
    num_components: int,
    data_dim: int,
    alpha: float = 1.0,
    beta_a: float = 1.0,
    beta_b: float = 1.0,
    dtype=jnp.float32,
) -> BmmNat:
    """Conjugate prior naturals: Dir(α) weights, Beta(a, b) per (k, j)."""
    k, d = num_components, data_dim
    ab = jnp.broadcast_to(
        jnp.asarray([beta_a, beta_b], dtype=dtype), (k, d, 2)
    )
    return BmmNat(
        dir_nat=jnp.full((k,), alpha - 1.0, dtype=dtype),
        beta_nat=beta.standard_to_natural(ab),
    )


def init_variational(
    key: jax.Array,
    prior: BmmNat,
    data: jnp.ndarray | None = None,
    pseudo_counts: float = 2.0,
    blur: float = 0.25,
) -> BmmNat:
    """q's naturals = prior + pseudo-observations at random data points.

    Each component pretends to have seen ``pseudo_counts`` copies of a
    random data point blurred toward 0.5 (``blur``·0.5 + (1−blur)·x) so no
    Beta starts at a degenerate corner. The increment is a valid
    sufficient-statistic bundle, so the result is automatically a valid
    Beta natural (a, b > prior's) — same construction as
    ``gmm.init_variational``.
    """
    k, d = prior.beta_nat.shape[0], prior.beta_nat.shape[1]
    dtype = prior.beta_nat.dtype
    if data is None:
        locs = jax.random.uniform(key, (k, d), dtype=dtype)
    else:
        idx = jax.random.choice(key, data.shape[0], (k,), replace=False)
        locs = data[idx].astype(dtype)
    locs = blur * 0.5 + (1.0 - blur) * locs
    c = pseudo_counts
    inc = c * jnp.stack([locs, 1.0 - locs], axis=-1)
    return BmmNat(
        dir_nat=prior.dir_nat + c,
        beta_nat=prior.beta_nat + inc,
    )


def expected_params(nat: BmmNat) -> BmmExpected:
    elog = beta.expected_log_theta(beta.natural_to_standard(nat.beta_nat))
    return BmmExpected(
        elog_pi=dirichlet.expected_log_pi(
            dirichlet.natural_to_standard(nat.dir_nat)
        ),
        elog_theta=elog[..., 0],
        elog_1m_theta=elog[..., 1],
    )


def log_responsibilities(x: jnp.ndarray, exp: BmmExpected) -> jnp.ndarray:
    """Unnormalized log r (N, K): E[log π_k] + Σ_j ⟨T(x_j), E[log θ·]⟩.

    One (N, D) × (D, K) matmul per term — batched and MXU-friendly; no
    per-pixel loop.
    """
    return (
        exp.elog_pi[None, :]
        + x @ exp.elog_theta.T
        + (1.0 - x) @ exp.elog_1m_theta.T
    )


def e_step(x: jnp.ndarray, exp: BmmExpected):
    """Responsibilities (N, K) and per-point local evidence (N,)."""
    log_rho = log_responsibilities(x, exp)
    evidence = jax.scipy.special.logsumexp(log_rho, axis=-1)
    return jnp.exp(log_rho - evidence[:, None]), evidence


def suff_stats(
    x: jnp.ndarray, resp: jnp.ndarray, scale: float | jnp.ndarray = 1.0
) -> BmmSuffStats:
    """Weighted sufficient statistics, scaled by N/M (SURVEY.md §9.5)."""
    return BmmSuffStats(
        counts=scale * jnp.sum(resp, axis=0),
        s1=scale * (resp.T @ x),
    )


def stats_to_nat(stats: BmmSuffStats) -> BmmNat:
    """Map (N_k, s_kj) to natural-parameter increments.

    Dirichlet: Δη_k = N_k. Beta per (k, j): Δη = (s_kj, N_k − s_kj) —
    success/failure pseudo-counts.
    """
    fail = stats.counts[:, None] - stats.s1
    return BmmNat(
        dir_nat=stats.counts,
        beta_nat=jnp.stack([stats.s1, fail], axis=-1),
    )


def kl_global(nat: BmmNat, prior: BmmNat) -> jnp.ndarray:
    """KL(q(π)‖p) + Σ_{k,j} KL(q(θ_kj)‖p) — the global ELBO term."""
    kl_dir = dirichlet.kl(
        dirichlet.natural_to_standard(nat.dir_nat),
        dirichlet.natural_to_standard(prior.dir_nat),
    )
    kl_beta = beta.kl(
        beta.natural_to_standard(nat.beta_nat),
        beta.natural_to_standard(prior.beta_nat),
    )
    return kl_dir + jnp.sum(kl_beta)


def predictive_log_prob(nat: BmmNat, x: jnp.ndarray) -> jnp.ndarray:
    """EXACT posterior-predictive log-mass per point (N,) under q.

    p(x*) = Σ_k (α_k/α₀) Π_j θ̂_kj^{x_j} (1−θ̂_kj)^{1−x_j} with
    θ̂ = a/(a+b): integrating the factorized q(π, θ) is exact for a single
    point because one Bernoulli trial's Beta predictive is its mean.
    Commensurable with the SVAE/VAE IW log-mass bounds on binarized data —
    and a strictly stronger number (exact, not a bound).
    """
    alpha = dirichlet.natural_to_standard(nat.dir_nat)
    log_w = jnp.log(alpha) - jnp.log(jnp.sum(alpha))
    ab = beta.natural_to_standard(nat.beta_nat)
    theta = beta.mean(ab)  # (K, D)
    log_t, log_1mt = jnp.log(theta), jnp.log1p(-theta)
    comp = x @ log_t.T + (1.0 - x) @ log_1mt.T  # (N, K)
    return jax.scipy.special.logsumexp(comp + log_w[None, :], axis=-1)
