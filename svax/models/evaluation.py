"""Held-out evaluation: importance-weighted log-likelihood (SURVEY.md §3a).

The reference evaluated test ELBO / marginal log-likelihood proxies; this
module provides the tighter importance-weighted bounds (Burda et al. IWAE
estimator) for both the SVAE (proposal = the structured mixture posterior
q(z|x), target = expected-parameter GMM prior p̄(z) times the decoder) and
the plain VAE, plus the closed-form Bayesian posterior predictive for the
pure GMM (mixture of Student-t, Bishop PRML eq. 10.81).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from svax.expfam import dirichlet, niw
from svax.models import svae as svae_mod
from svax.models.svae import SvaeConfig
from svax.nets import mlp as nets
from svax.ops import batched_linalg as bl
from svax.pgm import gmm
from svax.pgm.gmm import GmmNat

_LOG_2PI = 1.8378770664093453
_LOG_PI = 1.1447298858494002


def _mixture_log_q(z: jnp.ndarray, post: svae_mod.SinPosterior) -> jnp.ndarray:
    """log q(z|x) = lse_k [log r̃_k + log N(z; μ̃_k, Σ̃_k)]; z: (S, N, d)."""
    d = z.shape[-1]
    diff = z[:, :, None, :] - post.mean[None]  # (S, N, K, d)
    # Mahalanobis via the precision Cholesky: ‖L̃ᵀ diff‖² with J̃ = L̃L̃ᵀ.
    lt_diff = jnp.einsum(
        "nkij,snkj->snki", jnp.swapaxes(post.prec_chol, -1, -2), diff,
        precision=jax.lax.Precision.HIGHEST,
    )
    quad = jnp.sum(lt_diff**2, axis=-1)  # (S, N, K)
    log_n = -0.5 * quad + 0.5 * post.logdet_prec[None] - 0.5 * d * _LOG_2PI
    return jax.nn.logsumexp(post.log_resp[None] + log_n, axis=-1)  # (S, N)


def _expected_gmm_log_prob(z: jnp.ndarray, exp: gmm.GmmExpected) -> jnp.ndarray:
    """log p̄(z) under the expected-natural-parameter GMM; z: (..., d)."""
    d = z.shape[-1]
    quad = jnp.einsum(
        "...i,kij,...j->...k", z, exp.prec, z, precision=jax.lax.Precision.HIGHEST
    )
    cross = jnp.einsum(
        "...i,ki->...k", z, exp.prec_mean, precision=jax.lax.Precision.HIGHEST
    )
    logp_k = (
        exp.log_pi
        + 0.5 * exp.logdet
        - 0.5 * (quad - 2.0 * cross + exp.quad)
        - 0.5 * d * _LOG_2PI
    )
    return jax.nn.logsumexp(logp_k, axis=-1)


def svae_iw_loglik(
    nn_params: dict,
    pgm_nat: GmmNat,
    x: jnp.ndarray,
    key: jax.Array,
    config: SvaeConfig,
    num_samples: int = 100,
) -> jnp.ndarray:
    """Per-point IW bound: lse_s[log p(x|z)p̄(z)/q(z|x)] − log S; (N,)."""
    exp = gmm.expected_params(pgm_nat)
    pot_h, pot_p = nets.encoder_apply(
        nn_params["encoder"], x, config.activation,
        head=getattr(config, "encoder_head", "diag"),
    )
    post = svae_mod.sin_combine(pot_h, pot_p, exp, jitter=config.jitter)

    k_cat, k_norm = jax.random.split(key)
    # Sample mixture component per (s, n) via Gumbel-max on log r̃.
    gumbel = jax.random.gumbel(
        k_cat, (num_samples,) + post.log_resp.shape, dtype=x.dtype
    )
    choice = jnp.argmax(post.log_resp[None] + gumbel, axis=-1)  # (S, N)

    z_all = svae_mod.sample_posterior(k_norm, post, num_samples)  # (S, N, K, d)
    z = jnp.take_along_axis(z_all, choice[..., None, None], axis=2)[:, :, 0, :]

    log_q = _mixture_log_q(z, post)  # (S, N)
    log_prior = _expected_gmm_log_prob(z, exp)  # (S, N)
    loglik = nets.log_likelihood(
        nn_params["decoder"], z, x[None], config.likelihood, config.activation
    )  # (S, N)
    log_w = loglik + log_prior - log_q
    return jax.nn.logsumexp(log_w, axis=0) - jnp.log(float(num_samples))


def _expected_smm_log_prob(
    z: jnp.ndarray, exp: gmm.GmmExpected, dof: float
) -> jnp.ndarray:
    """log p̄(z) under the expected-parameter Student-t mixture; z (..., d).

    Marginalizing u ~ Gamma(a₀, b₀) out of exp(E[log p(z|u,θ,k)]) in closed
    form:  p̄(z|k) = (2π)^{−d/2} e^{½E[log|Λ|]} b₀^{a₀} Γ(a₀+d/2)/Γ(a₀)
                    · (b₀ + Q(z)/2)^{−(a₀+d/2)},
    Q(z) = zᵀE[Λ]z − 2zᵀE[Λμ] + E[μᵀΛμ] — the u-augmented analog of
    `_expected_gmm_log_prob` (dof → ∞ recovers it)."""
    d = z.shape[-1]
    a0 = b0 = 0.5 * dof
    a = a0 + 0.5 * d
    hi = jax.lax.Precision.HIGHEST
    quad = jnp.einsum("...i,kij,...j->...k", z, exp.prec, z, precision=hi)
    cross = jnp.einsum("...i,ki->...k", z, exp.prec_mean, precision=hi)
    q_z = quad - 2.0 * cross + exp.quad
    logp_k = (
        exp.log_pi
        + 0.5 * exp.logdet
        - 0.5 * d * _LOG_2PI
        + a0 * jnp.log(b0)
        + gammaln(a)
        - gammaln(a0)
        - a * jnp.log(b0 + 0.5 * q_z)
    )
    return jax.nn.logsumexp(logp_k, axis=-1)


def svae_smm_iw_loglik(
    nn_params: dict,
    pgm_nat: GmmNat,
    x: jnp.ndarray,
    key: jax.Array,
    config: SvaeConfig,
    num_samples: int = 100,
) -> jnp.ndarray:
    """IW bound for the SMM-prior SVAE: proposal = the structured mixture
    posterior of svae_smm (u marginalized out of the target in closed
    form), target = expected-parameter Student-t mixture × decoder."""
    from svax.models import svae_smm

    assert config.dof > 0.0
    exp = gmm.expected_params(pgm_nat)
    pot_h, pot_p = nets.encoder_apply(
        nn_params["encoder"], x, config.activation,
        head=getattr(config, "encoder_head", "diag"),
    )
    post, _ = svae_smm.smm_combine(
        pot_h, pot_p, exp, config.dof, config.smm_iters, config.jitter
    )

    k_cat, k_norm = jax.random.split(key)
    gumbel = jax.random.gumbel(
        k_cat, (num_samples,) + post.log_resp.shape, dtype=x.dtype
    )
    choice = jnp.argmax(post.log_resp[None] + gumbel, axis=-1)  # (S, N)
    z_all = svae_mod.sample_posterior(k_norm, post, num_samples)
    z = jnp.take_along_axis(z_all, choice[..., None, None], axis=2)[:, :, 0, :]

    log_q = _mixture_log_q(z, post)
    log_prior = _expected_smm_log_prob(z, exp, config.dof)
    loglik = nets.log_likelihood(
        nn_params["decoder"], z, x[None], config.likelihood, config.activation
    )
    log_w = loglik + log_prior - log_q
    return jax.nn.logsumexp(log_w, axis=0) - jnp.log(float(num_samples))


def vae_iw_loglik(
    params: dict,
    x: jnp.ndarray,
    key: jax.Array,
    config,
    num_samples: int = 100,
) -> jnp.ndarray:
    """IWAE bound for the plain VAE baseline; (N,)."""
    pot_h, pot_p = nets.encoder_apply(params["encoder"], x, config.activation)
    var = 1.0 / pot_p
    mean = pot_h * var
    eps = jax.random.normal(key, (num_samples,) + mean.shape, dtype=mean.dtype)
    z = mean[None] + jnp.sqrt(var)[None] * eps
    log_q = jnp.sum(
        -0.5 * eps**2 - 0.5 * jnp.log(var)[None] - 0.5 * _LOG_2PI, axis=-1
    )
    log_prior = jnp.sum(-0.5 * z**2 - 0.5 * _LOG_2PI, axis=-1)
    loglik = nets.log_likelihood(
        params["decoder"], z, x[None], config.likelihood, config.activation
    )
    log_w = loglik + log_prior - log_q
    return jax.nn.logsumexp(log_w, axis=0) - jnp.log(float(num_samples))


def cluster_purity(resp: jnp.ndarray, labels: jnp.ndarray) -> float:
    """Hard-assignment cluster purity vs ground-truth labels (SURVEY.md §3a).

    purity = (1/N) Σ_clusters max_class |cluster ∩ class| ∈ (0, 1].
    """
    import numpy as np

    hard = np.asarray(resp).argmax(-1)
    labels = np.asarray(labels)
    total = 0
    for c in np.unique(hard):
        members = labels[hard == c]
        if len(members):
            total += np.bincount(members).max()
    return float(total) / float(len(labels))


def gmm_predictive_log_prob(nat: GmmNat, x: jnp.ndarray) -> jnp.ndarray:
    """Exact VB posterior predictive of the conjugate GMM (Bishop 10.81).

    p(x*) = Σ_k (α_k/Σα) · St(x*; m_k, L_k, ν_k + 1 − d) with scale
    L_k = ((κ_k + 1) Φ_k) / (κ_k (ν_k + 1 − d)); returns per-point (N,).
    """
    alpha = dirichlet.natural_to_standard(nat.dir_nat)
    std = niw.natural_to_standard(nat.niw_nat)
    d = x.shape[-1]
    dof = std.nu + 1.0 - d  # (K,)
    scale_factor = (std.kappa + 1.0) / (std.kappa * dof)  # (K,)
    scale = scale_factor[:, None, None] * std.phi  # (K, d, d)
    chol = bl.cholesky(scale)
    diff = x[:, None, :] - std.m[None]  # (N, K, d)
    sol = bl.solve_tril_vec(jnp.broadcast_to(chol[None], diff.shape[:2] + chol.shape[-2:]), diff)
    maha = jnp.sum(sol**2, axis=-1)  # (N, K)
    logdet = bl.logdet_from_chol(chol)  # (K,)
    log_st = (
        gammaln(0.5 * (dof + d))
        - gammaln(0.5 * dof)
        - 0.5 * d * (jnp.log(dof) + _LOG_PI)
        - 0.5 * logdet
        - 0.5 * (dof + d) * jnp.log1p(maha / dof)
    )
    log_mix = jnp.log(alpha) - jnp.log(jnp.sum(alpha))
    return jax.nn.logsumexp(log_mix[None] + log_st, axis=-1)
