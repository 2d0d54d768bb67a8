"""SVAE with a Student-t mixture (SMM) latent prior — robust SVAE.

The paper behind the reference (arXiv:1803.05589) uses structured
inference networks for both GMM- and SMM-prior SVAEs; the SMM prior makes
the latent mixture robust to outliers. Reference counterpart unverifiable
(empty mount, SURVEY.md §0) — this module is derived from the same
scale-augmentation scheme as ``svax.pgm.smm`` (data-space SMM), lifted to
the latent space:

    z | k, u, θ ~ N(μ_k, (u Λ_k)⁻¹),   u ~ Gamma(a₀, b₀),  a₀ = b₀ = dof/2.

Mean-field structured posterior  q(z, u, k | x) = r̃_nk q(z|n,k) q(u|n,k):

* q(z|n,k) = N(μ̃, J̃⁻¹) with J̃ = diag(Pₙ) + ū·E[Λ_k],
  μ̃ = J̃⁻¹(hₙ + ū·E[Λμ]_k)                 (SIN combine, ū = E_q[u]);
* q(u|n,k) = Gamma(a, b) with a = a₀ + d/2,
  b = b₀ + ½·Q_nk,  Q = E[(z−μ_k)ᵀΛ_k(z−μ_k)] under q(z)q(θ);
* r̃ follows the SIN product-normalizer convention of the GMM-prior SVAE
  (the ū-scaled product-of-Gaussians log-normalizer plus E[log π_k] and
  the u-subproblem free energy); the per-point local term is the explicit
  Σ_k r̃ (A_nk − log r̃_nk) with A_nk the per-component free energy
  E[log p̄(z,u|k)π_k] + H[q(z)] + H[q(u)] — a valid bound for any r̃.

The u–z coupling is resolved by ``config.smm_iters`` coordinate rounds
inside the jitted forward (ū=1 → z-update → u-update, repeated; final
z-update after the last u-update keeps q(z) optimal given q(u), so the
bound is tight in z). Everything is closed form except the recon MC.

CVI payload (conditional conjugacy): the NIW sees u-weighted latent
moments  (Σ r̃ū μ̃, Σ r̃ū, Σ r̃ū E[zzᵀ], Σ r̃)  — the same
`counts ≠ u_counts` split as the data-space SMM, reusing its
``SmmSuffStats``/``stats_to_nat``. As dof → ∞ every formula reduces to
the GMM-prior SVAE (tested).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from svax.models.svae import SvaeConfig, SvaeOutputs
from svax.nets import mlp as nets
from svax.ops import batched_linalg as bl
from svax.pgm import gmm, smm
from svax.pgm.gmm import GmmExpected, GmmNat
from svax.pgm.smm import SmmSuffStats, stats_to_nat  # noqa: F401  (re-export)

_LOG_2PI = 1.8378770664093453


class SmmPosterior(NamedTuple):
    """Per-(n,k) structured posterior q(z|x,k) q(u|x,k) and weights."""

    mean: jnp.ndarray  # (N, K, d) μ̃
    prec_chol: jnp.ndarray  # (N, K, d, d) chol(J̃)
    cov: jnp.ndarray  # (N, K, d, d) Σ̃
    log_resp: jnp.ndarray  # (N, K)
    logdet_prec: jnp.ndarray  # (N, K) log|J̃|
    e_u: jnp.ndarray  # (N, K) E[u]
    e_log_u: jnp.ndarray  # (N, K) E[log u]
    gamma_b: jnp.ndarray  # (N, K) rate of q(u)


def _z_update(pot_h, pot_p, exp: GmmExpected, e_u, jitter):
    """q(z|n,k) given E[u]: ū-scaled SIN combine (§9.4 with u-augmentation).

    ``pot_p`` may be the diagonal (N, d) or full (N, d, d) encoder
    precision (svae.sin_combine convention) — per-n constants cancel in
    the responsibility softmax for both.
    """
    d = pot_h.shape[-1]
    eye = jnp.eye(d, dtype=pot_h.dtype)
    if pot_p.ndim == pot_h.ndim + 1:
        pot_prec = pot_p[:, None]  # full (N, d, d) precision message
    else:
        pot_prec = pot_p[:, None, :, None] * eye
    prec = pot_prec + e_u[:, :, None, None] * exp.prec[None]
    if jitter > 0.0:
        prec = prec + jitter * eye
    h = pot_h[:, None, :] + e_u[:, :, None] * exp.prec_mean[None]
    chol = bl.cholesky(prec)
    mean = bl.cho_solve_vec(chol, h)
    return mean, chol, bl.inv_psd(chol), bl.logdet_from_chol(chol), h


def _quad_latent(mean, cov, exp: GmmExpected):
    """Q_nk = E[(z−μ_k)ᵀΛ_k(z−μ_k)] = tr(JΣ̃) + μ̃ᵀJμ̃ − 2μ̃ᵀh̄ + E[μᵀΛμ]."""
    hi = jax.lax.Precision.HIGHEST
    tr = jnp.einsum("kij,nkij->nk", exp.prec, cov, precision=hi)
    quad_mu = jnp.einsum("nki,kij,nkj->nk", mean, exp.prec, mean, precision=hi)
    cross = jnp.einsum("ki,nki->nk", exp.prec_mean, mean, precision=hi)
    return tr + quad_mu - 2.0 * cross + exp.quad[None, :]


def smm_combine(
    pot_h: jnp.ndarray,
    pot_p: jnp.ndarray,
    exp: GmmExpected,
    dof: float,
    num_iters: int = 2,
    jitter: float = 0.0,
    axis_comp: str | None = None,
    envelope_grads: bool = False,
) -> SmmPosterior:
    """Coordinate-ascent u–z combine; returns the converged posterior family.

    ``num_iters`` u-updates, each followed by a z-update (ū starts at 1, the
    GMM combine). Two quantities come out per (n, k):

    * ``log r̃`` — the SIN convention of the GMM-prior SVAE, i.e. the
      log-normalizer of the product of the encoder Gaussian with the
      ū-scaled expected-parameter component message (plus E[log π_k] and
      the u-subproblem free energy −KL(q(u)‖p(u))). As dof → ∞ this is
      EXACTLY the GMM formula (svae.sin_combine), which the reduction
      test pins.
    * ``free_energy`` A_nk = E[log p̄(z,u|k)π_k] + H[q(z|k)] + H[q(u|k)] —
      the expectation-closed per-component bound contribution; the local
      ELBO term is Σ_k r̃ (A_nk − log r̃_nk), a valid bound for ANY r̃.
    """
    d = pot_h.shape[-1]
    a0 = b0 = 0.5 * dof
    a = a0 + 0.5 * d
    e_u = jnp.ones(pot_h.shape[:1] + exp.log_pi.shape, dtype=pot_h.dtype)

    for _ in range(max(num_iters, 1)):
        mean, chol, cov, logdet, h = _z_update(pot_h, pot_p, exp, e_u, jitter)
        quad = _quad_latent(mean, cov, exp)
        gamma_b = b0 + 0.5 * quad
        e_u = a / gamma_b
    if envelope_grads:
        # Envelope theorem: q(u) = Gamma(a, gamma_b) maximizes the bound
        # given q(z), so at the coordinate-ascent fixed point
        # ∂bound/∂q(u) = 0 and the cotangent chain through the u-rounds
        # carries no signal — stopping BOTH q(u) parameters drops
        # num_iters whole combine chains from the backward pass (measured
        # step-cost + gradient-bias numbers in BASELINE.md).
        gamma_b = jax.lax.stop_gradient(gamma_b)
        e_u = a / gamma_b
    # Final z-update so q(z) is optimal for the final q(u).
    mean, chol, cov, logdet, h = _z_update(pot_h, pot_p, exp, e_u, jitter)
    quad = _quad_latent(mean, cov, exp)
    e_log_u = digamma(a) - jnp.log(gamma_b)

    # −KL(q(u)‖p(u)) = E[log p(u)] + H[q(u)] — shared by both quantities.
    e_log_pu = a0 * jnp.log(b0) - gammaln(a0) + (a0 - 1.0) * e_log_u - b0 * e_u
    h_u = a - jnp.log(gamma_b) + gammaln(a) + (1.0 - a) * digamma(a)
    u_free = e_log_pu + h_u

    # Message constant of exp(E[log p(z|u,θ,k)]) under q(u)q(θ):
    msg_const = (
        0.5 * d * e_log_u
        - 0.5 * d * _LOG_2PI
        + 0.5 * exp.logdet[None, :]
        - 0.5 * e_u * exp.quad[None, :]
    )
    # Product-of-Gaussians log-normalizer (SIN convention, §9.4 ū-scaled):
    log_rho = (
        exp.log_pi[None, :]
        + msg_const
        + 0.5 * jnp.sum(mean * h, axis=-1)
        - 0.5 * logdet
        + u_free
    )
    if axis_comp is None:
        log_resp = jax.nn.log_softmax(log_rho, axis=-1)
    else:
        # K-sharded components: the softmax normalizer rides the mesh axis.
        log_resp = log_rho - gmm.lse_over_components(log_rho, axis_comp)[:, None]

    # Per-component free energy A_nk for the explicit local bound term:
    e_log_pz = (
        0.5 * d * e_log_u
        - 0.5 * d * _LOG_2PI
        + 0.5 * exp.logdet[None, :]
        - 0.5 * e_u * quad
    )
    h_z = 0.5 * d * (1.0 + _LOG_2PI) - 0.5 * logdet
    free_energy = exp.log_pi[None, :] + e_log_pz + h_z + u_free
    return SmmPosterior(
        mean=mean,
        prec_chol=chol,
        cov=cov,
        log_resp=log_resp,
        logdet_prec=logdet,
        e_u=e_u,
        e_log_u=e_log_u,
        gamma_b=gamma_b,
    ), free_energy


def suff_stats_latent(post: SmmPosterior, scale) -> SmmSuffStats:
    """u-weighted latent moments → the SMM CVI payload (§9.5 analog)."""
    hi = jax.lax.Precision.HIGHEST
    resp = jnp.exp(post.log_resp)
    ru = resp * post.e_u
    ezz = post.cov + post.mean[..., :, None] * post.mean[..., None, :]
    return SmmSuffStats(
        counts=scale * jnp.sum(resp, axis=0),
        u_counts=scale * jnp.sum(ru, axis=0),
        mean_stat=scale * jnp.einsum("nk,nki->ki", ru, post.mean, precision=hi),
        scatter_stat=scale * jnp.einsum("nk,nkij->kij", ru, ezz, precision=hi),
    )


def forward(
    nn_params: dict,
    pgm_nat: GmmNat,
    prior_nat: GmmNat,
    x: jnp.ndarray,
    key: jax.Array,
    config: SvaeConfig,
    eps: jnp.ndarray | None = None,
    axis_comp: str | None = None,
) -> SvaeOutputs:
    """Full SMM-prior SVAE forward → structured ELBO + CVI payload.

    ``config.dof`` (> 0) is the Student-t degrees of freedom;
    ``config.smm_iters`` the u–z coordinate rounds. With ``axis_comp`` the
    PGM naturals/outputs hold K-shards over that mesh axis (component
    parallelism, same contract as the GMM-prior forward): the u–z
    coordinate rounds are K-local, only the responsibility normalizer and
    the Σ_k reductions ride the axis.
    """
    assert config.dof > 0.0, "config.dof must be set (> 0) for the SMM prior"
    assert config.recon_mode == "weighted", (
        "the SMM-prior SVAE implements the weighted recon estimator only"
    )
    from svax.models import svae as svae_mod

    n = x.shape[0]
    scale = config.num_total / n

    exp = gmm.expected_params(pgm_nat, axis_comp=axis_comp)
    pot_h, pot_p = nets.encoder_apply(
        nn_params["encoder"], x, config.activation, config.nn_precision,
        head=config.encoder_head
    )
    post, free_energy = smm_combine(
        pot_h, pot_p, exp, config.dof, config.smm_iters, config.jitter,
        axis_comp=axis_comp, envelope_grads=config.smm_envelope_grads,
    )
    resp = jnp.exp(post.log_resp)

    z = svae_mod.sample_posterior(key, post, config.num_samples, eps=eps)
    if config.likelihood == "bernoulli":
        loglik = nets.bernoulli_loglik_decomposed(
            nn_params["decoder"], z, x, config.activation, config.nn_precision,
            fused=config.fused_decoder,
            compute_dtype=config.decoder_compute_dtype,
        )
    else:
        loglik = nets.log_likelihood(
            nn_params["decoder"], z, x[None, :, None, :], config.likelihood,
            config.activation, config.nn_precision,
            compute_dtype=config.decoder_compute_dtype,
        )
    recon_nk = jnp.mean(loglik, axis=0)
    recon = scale * jnp.sum(resp * recon_nk)

    # Local term Σ_n Σ_k r̃ (A_nk − log r̃_nk): a valid bound for any r̃ —
    # here r̃ follows the SIN product-normalizer convention, so the
    # explicit sum (not a logsumexp collapse) is required.
    local = -scale * jnp.sum(resp * (free_energy - post.log_resp))
    if axis_comp is not None:
        # Σ_k reductions completed across the component shards.
        recon = jax.lax.psum(recon, axis_comp)
        local = jax.lax.psum(local, axis_comp)
    global_kl = gmm.kl_global(pgm_nat, prior_nat, axis_comp=axis_comp)
    elbo = recon - local - global_kl

    stats = suff_stats_latent(post, scale)
    return SvaeOutputs(
        elbo=elbo,
        recon=recon,
        local_kl=local,
        global_kl=global_kl,
        suff_stats=stats,
        posterior=post,
    )


# Parameter init is identical to the GMM-prior SVAE.
from svax.models.svae import init_params  # noqa: E402, F401
