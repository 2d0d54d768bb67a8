"""Gaussian-mixture PGM: expected parameters, E-step, sufficient statistics.

Implements the conjugate GMM machinery of SURVEY.md §4.2/§9 with a
Dirichlet(α) prior over mixing weights and one NIW prior per component.
Everything is batched over K along the leading component axis and jittable;
the observed-data E-step (pure-GMM workload, BASELINE config #2) and the
latent-moment sufficient statistics (SVAE CVI path, §9.5) share this module.

Reference counterpart: recalled ``gmm.py`` (unverified — empty mount,
SURVEY.md §0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svax.expfam import dirichlet, niw
from svax.expfam.niw import NiwNat, NiwStandard

_LOG_2PI = 1.8378770664093453


class GmmNat(NamedTuple):
    """Global PGM natural parameters: q(π) Dirichlet and q(μ_k, Λ_k) NIW."""

    dir_nat: jnp.ndarray  # (K,) Dirichlet natural α − 1
    niw_nat: NiwNat  # component-batched NIW naturals, leading axis K


class GmmExpected(NamedTuple):
    """Expected natural parameters / sufficient stats — the VMP messages."""

    log_pi: jnp.ndarray  # (K,)    E[log π]
    prec: jnp.ndarray  # (K, d, d) E[Λ]
    prec_mean: jnp.ndarray  # (K, d) E[Λμ]
    quad: jnp.ndarray  # (K,)      E[μᵀΛμ]
    logdet: jnp.ndarray  # (K,)    E[log|Λ|]


class GmmSuffStats(NamedTuple):
    """Weighted sufficient statistics (§9.5) — the psum payload for DP."""

    counts: jnp.ndarray  # (K,)      N_k = Σ_n r_nk
    mean_stat: jnp.ndarray  # (K, d) s₁ = Σ_n r_nk E[z_n]
    scatter_stat: jnp.ndarray  # (K, d, d) S₂ = Σ_n r_nk E[z_n z_nᵀ]


def expected_params(nat: GmmNat, axis_comp: str | None = None) -> GmmExpected:
    """Compute the expected-parameter messages from the global naturals.

    With ``axis_comp`` set, ``nat`` holds only this device's K-shard of the
    components (component/expert parallelism over a mesh axis): the NIW
    expectations are embarrassingly parallel per component, and only the
    Dirichlet normalizer ψ(Σα) needs one scalar psum over the shard axis.
    """
    alpha = dirichlet.natural_to_standard(nat.dir_nat)
    stats = niw.expected_stats_nat(nat.niw_nat)
    if axis_comp is None:
        log_pi = dirichlet.expected_log_pi(alpha)
    else:
        from jax.scipy.special import digamma

        total = jax.lax.psum(jnp.sum(alpha, axis=-1), axis_comp)
        log_pi = digamma(alpha) - digamma(total)
    return GmmExpected(
        log_pi=log_pi,
        prec=stats.prec,
        prec_mean=stats.prec_mean,
        quad=stats.quad,
        logdet=stats.logdet,
    )


def lse_over_components(log_rho: jnp.ndarray, axis_comp: str | None = None) -> jnp.ndarray:
    """Row-wise logsumexp over the component axis, across shards if sharded.

    log_rho (N, K_local) → (N,). With ``axis_comp``, the max and the
    exp-sum ride the mesh axis so softmaxes normalize over ALL components.
    """
    m = jnp.max(log_rho, axis=-1)
    if axis_comp is not None:
        # The stabilizing max is a constant shift (any constant gives the
        # exact same lse value and softmax gradient), so hide the pmax —
        # which has no differentiation rule — behind a zero-derivative
        # custom_jvp and run it on a gradient-free input.
        m = _pmax_const(jax.lax.stop_gradient(m), axis_comp)
    se = jnp.sum(jnp.exp(log_rho - m[:, None]), axis=-1)
    if axis_comp is not None:
        se = jax.lax.psum(se, axis_comp)
    return m + jnp.log(se)


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_jvp, nondiff_argnums=(1,))
def _pmax_const(m, axis_comp):
    return jax.lax.pmax(m, axis_comp)


@_pmax_const.defjvp
def _pmax_const_jvp(axis_comp, primals, tangents):
    (m,) = primals
    return jax.lax.pmax(m, axis_comp), jnp.zeros_like(m)


def make_prior(
    num_components: int,
    latent_dim: int,
    alpha: float = 1.0,
    mean: float = 0.0,
    kappa: float = 0.05,
    psi_scale: float = 1.0,
    nu: float | None = None,
    dtype=jnp.float32,
) -> GmmNat:
    """Conjugate prior naturals (paper-typical defaults, SURVEY.md §4.5)."""
    k, d = num_components, latent_dim
    if nu is None:
        nu = d + 1.0
    std = NiwStandard(
        m=jnp.full((k, d), mean, dtype=dtype),
        kappa=jnp.full((k,), kappa, dtype=dtype),
        phi=jnp.broadcast_to(psi_scale * jnp.eye(d, dtype=dtype), (k, d, d)),
        nu=jnp.full((k,), nu, dtype=dtype),
    )
    return GmmNat(
        dir_nat=jnp.full((k,), alpha - 1.0, dtype=dtype),
        niw_nat=niw.standard_to_natural(std),
    )


def init_variational(
    key: jax.Array,
    prior: GmmNat,
    data: jnp.ndarray | None = None,
    mean_scale: float = 1.0,
    pseudo_counts: float = 1.0,
) -> GmmNat:
    """Initialize q's naturals as the prior plus pseudo-observations.

    Each component pretends to have seen ``pseudo_counts`` observations at a
    random location (a random data point if ``data`` is given, otherwise
    N(0, mean_scale²)). Because the increment is a valid sufficient-statistic
    bundle, the result is automatically a valid NIW natural parameter
    (PSD Φ, ν > d − 1) — no projection needed.
    """
    k = prior.dir_nat.shape[0]
    d = prior.niw_nat.eta1.shape[-1]
    kmean, kpt = jax.random.split(key)
    if data is None:
        locs = mean_scale * jax.random.normal(kmean, (k, d), dtype=prior.niw_nat.eta1.dtype)
    else:
        idx = jax.random.choice(kpt, data.shape[0], (k,), replace=False)
        locs = data[idx].astype(prior.niw_nat.eta1.dtype)
    c = pseudo_counts
    outer = locs[:, :, None] * locs[:, None, :]
    inc_niw = NiwNat(
        eta1=c * locs,
        eta2=jnp.full((k,), c, dtype=locs.dtype),
        eta3=c * (outer + jnp.eye(d, dtype=locs.dtype)),
        eta4=jnp.full((k,), c, dtype=locs.dtype),
    )
    return GmmNat(
        dir_nat=prior.dir_nat + c,
        niw_nat=jax.tree.map(jnp.add, prior.niw_nat, inc_niw),
    )


def log_responsibilities_obs(x: jnp.ndarray, exp: GmmExpected) -> jnp.ndarray:
    """Unnormalized log responsibilities for observed data (SURVEY.md §4.2).

    log ρ_nk = E[logπ_k] + ½E[log|Λ_k|] − ½(xᵀE[Λ]x − 2xᵀE[Λμ] + E[μᵀΛμ])
               − (d/2) log 2π ;  x: (N, d) → (N, K).
    """
    d = x.shape[-1]
    # xᵀ E[Λ_k] x via one MXU-friendly contraction: (N,d)·(K,d,d)·(N,d).
    xJ = jnp.einsum("ni,kij->nkj", x, exp.prec, precision=jax.lax.Precision.HIGHEST)
    quad_x = jnp.einsum("nkj,nj->nk", xJ, x, precision=jax.lax.Precision.HIGHEST)
    cross = jnp.einsum("ni,ki->nk", x, exp.prec_mean, precision=jax.lax.Precision.HIGHEST)
    return (
        exp.log_pi[None, :]
        + 0.5 * exp.logdet[None, :]
        - 0.5 * (quad_x - 2.0 * cross + exp.quad[None, :])
        - 0.5 * d * _LOG_2PI
    )


def e_step_obs(x: jnp.ndarray, exp: GmmExpected) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Responsibilities r (N, K) and per-point evidence lse_k log ρ (N,)."""
    log_rho = log_responsibilities_obs(x, exp)
    evidence = jax.nn.logsumexp(log_rho, axis=-1)
    resp = jnp.exp(log_rho - evidence[:, None])
    return resp, evidence


def suff_stats_obs(x: jnp.ndarray, resp: jnp.ndarray, scale: float | jnp.ndarray = 1.0) -> GmmSuffStats:
    """Weighted stats (N_k, Σ r x, Σ r xxᵀ) for observed data, × N/M scale."""
    counts = jnp.sum(resp, axis=0)
    mean_stat = jnp.einsum("nk,ni->ki", resp, x, precision=jax.lax.Precision.HIGHEST)
    scatter_stat = jnp.einsum(
        "nk,ni,nj->kij", resp, x, x, precision=jax.lax.Precision.HIGHEST
    )
    return GmmSuffStats(
        counts=scale * counts, mean_stat=scale * mean_stat, scatter_stat=scale * scatter_stat
    )


def suff_stats_from_moments(
    resp: jnp.ndarray,
    ez: jnp.ndarray,
    ezz: jnp.ndarray,
    scale: float | jnp.ndarray = 1.0,
) -> GmmSuffStats:
    """Weighted stats from per-(n,k) posterior moments (SVAE path, §9.5).

    resp (N, K); ez (N, K, d) = μ̃; ezz (N, K, d, d) = Σ̃ + μ̃μ̃ᵀ.
    """
    counts = jnp.sum(resp, axis=0)
    mean_stat = jnp.einsum("nk,nki->ki", resp, ez, precision=jax.lax.Precision.HIGHEST)
    scatter_stat = jnp.einsum(
        "nk,nkij->kij", resp, ezz, precision=jax.lax.Precision.HIGHEST
    )
    return GmmSuffStats(
        counts=scale * counts, mean_stat=scale * mean_stat, scatter_stat=scale * scatter_stat
    )


def stats_to_nat(stats: GmmSuffStats) -> GmmNat:
    """Map sufficient statistics onto natural-parameter increments (§9.5)."""
    return GmmNat(
        dir_nat=stats.counts,
        niw_nat=NiwNat(
            eta1=stats.mean_stat,
            eta2=stats.counts,
            eta3=stats.scatter_stat,
            eta4=stats.counts,
        ),
    )


def sample_generative(
    key: jax.Array, nat: GmmNat, num_samples: int, sample_params: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ancestral draws from the (posterior) mixture: returns (x, labels).

    With ``sample_params`` the mixture parameters are drawn from q(θ)
    (π ~ Dir, (μ_k, Λ_k) ~ NIW via Bartlett); otherwise the expected
    parameters E[π], m_k, E[Σ_k] are used (the reference-style plug-in).
    """
    from svax.expfam import dirichlet as dir_mod
    from svax.expfam import niw as niw_mod

    k_pi, k_theta, k_cat, k_z = jax.random.split(key, 4)
    alpha = dirichlet.natural_to_standard(nat.dir_nat)
    std = niw.natural_to_standard(nat.niw_nat)
    d = std.m.shape[-1]
    if sample_params:
        pi = dir_mod.sample(k_pi, alpha)
        mu, lam = niw_mod.sample(k_theta, std)
        from svax.ops import batched_linalg as bl

        chol_lam = bl.cholesky(lam)
    else:
        pi = alpha / jnp.sum(alpha)
        mu = std.m
        cov = std.phi / jnp.maximum(std.nu - d - 1.0, 0.5)[..., None, None]
        from svax.ops import batched_linalg as bl

        chol_lam = bl.cholesky(bl.inv_psd(bl.cholesky(cov)))
    labels = jax.random.categorical(
        k_cat, jnp.log(pi), shape=(num_samples,)
    )
    eps = jax.random.normal(k_z, (num_samples, d), dtype=mu.dtype)
    from svax.ops import batched_linalg as bl

    x = mu[labels] + bl.solve_triu_vec(chol_lam[labels], eps)
    return x, labels


def kl_global(nat: GmmNat, prior: GmmNat, axis_comp: str | None = None) -> jnp.ndarray:
    """KL(q(π)‖p(π)) + Σ_k KL(q(μ_k,Λ_k)‖p(μ_k,Λ_k)) (§9.6 global term).

    With ``axis_comp``, nat/prior hold K-shards; the Dirichlet KL couples
    shards only through its Σα / lgamma(Σα) totals (one psum each), and the
    NIW KLs sum across shards with one psum. Returns the FULL global KL,
    replicated on every shard.
    """
    alpha_q = dirichlet.natural_to_standard(nat.dir_nat)
    alpha_p = dirichlet.natural_to_standard(prior.dir_nat)
    if axis_comp is None:
        kl_dir = dirichlet.kl(alpha_q, alpha_p)
        kl_niw = jnp.sum(niw.kl_nat(nat.niw_nat, prior.niw_nat))
        return kl_dir + kl_niw

    from jax.scipy.special import digamma, gammaln

    sum_q = jax.lax.psum(jnp.sum(alpha_q, axis=-1), axis_comp)
    sum_p = jax.lax.psum(jnp.sum(alpha_p, axis=-1), axis_comp)
    elogpi = digamma(alpha_q) - digamma(sum_q)
    per_k = (alpha_q - alpha_p) * elogpi - gammaln(alpha_q) + gammaln(alpha_p)
    kl_dir = (
        jax.lax.psum(jnp.sum(per_k, axis=-1), axis_comp)
        + gammaln(sum_q)
        - gammaln(sum_p)
    )
    kl_niw = jax.lax.psum(jnp.sum(niw.kl_nat(nat.niw_nat, prior.niw_nat)), axis_comp)
    return kl_dir + kl_niw


def elbo_obs(
    x: jnp.ndarray,
    nat: GmmNat,
    prior: GmmNat,
    scale: float | jnp.ndarray = 1.0,
) -> tuple[jnp.ndarray, dict]:
    """VB-GMM evidence lower bound on observed data.

    Using r = softmax(log ρ), the local term collapses to Σ_n lse_k log ρ_nk
    (Bishop §10.2 rearrangement), so
    ELBO = scale · Σ_n lse_k log ρ_nk − KL_global.
    With full-batch data and ρ-step = 1 this is the exact VBEM objective and
    must increase every iteration (tested).
    """
    exp = expected_params(nat)
    _, evidence = e_step_obs(x, exp)
    local = scale * jnp.sum(evidence)
    klg = kl_global(nat, prior)
    return local - klg, {"local": local, "kl_global": klg}
