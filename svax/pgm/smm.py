"""Student-t mixture model (SMM) via Gamma scale augmentation.

SURVEY.md §3a flags an SMM variant in the reference at low confidence
(`[RECALL-L]` — unverifiable, empty mount); the paper's robustness
discussion motivates it regardless. Model per component k:

    x | k, u ~ N(μ_k, (u Λ_k)⁻¹),   u ~ Gamma(a₀, b₀)   (a₀ = b₀ = ν_dof/2)

Integrating u out yields a Student-t with ν_dof = 2a₀ degrees of freedom.
VBEM (Svensén & Bishop 2005 style) with the same conjugate Dirichlet+NIW
globals as the GMM:

* q(u | n, k) = Gamma(a, b_nk) in closed form with a = a₀ + d/2 and
  b_nk = b₀ + ½ E[(x−μ_k)ᵀΛ_k(x−μ_k)];
* responsibilities collapse the u-subproblem's free energy:
  log r̃_nk ∝ E[logπ_k] + ½E[log|Λ_k|] − (d/2)log 2π
             + a₀ log b₀ + lnΓ(a) − lnΓ(a₀) − a log b_nk ;
* NIW natural increments carry E[u]-weighted moments with the *count*
  (not u-weighted) degrees-of-freedom increment:
  Δη = (Σ r E[u] x, Σ r E[u], Σ r E[u] xxᵀ, Σ r)  — note Δη₂ ≠ Δη₄,
  which the NiwNat convention supports directly.

As a₀ = b₀ → ∞, E[u] → 1 and every formula reduces to the GMM (tested).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from svax.expfam.niw import NiwNat
from svax.pgm import gmm
from svax.pgm.gmm import GmmExpected, GmmNat

_LOG_2PI = 1.8378770664093453


class SmmSuffStats(NamedTuple):
    """u-weighted sufficient statistics — the DP psum payload for the SMM."""

    counts: jnp.ndarray  # (K,)      Σ r            (→ Δη₄, Dirichlet)
    u_counts: jnp.ndarray  # (K,)    Σ r E[u]       (→ Δη₂)
    mean_stat: jnp.ndarray  # (K, d) Σ r E[u] x     (→ Δη₁)
    scatter_stat: jnp.ndarray  # (K, d, d) Σ r E[u] xxᵀ (→ Δη₃)


def _quad_form(x: jnp.ndarray, exp: GmmExpected) -> jnp.ndarray:
    """E[(x−μ_k)ᵀΛ_k(x−μ_k)] per (n, k)."""
    xj = jnp.einsum("ni,kij->nkj", x, exp.prec, precision=jax.lax.Precision.HIGHEST)
    quad_x = jnp.einsum("nkj,nj->nk", xj, x, precision=jax.lax.Precision.HIGHEST)
    cross = jnp.einsum("ni,ki->nk", x, exp.prec_mean, precision=jax.lax.Precision.HIGHEST)
    return quad_x - 2.0 * cross + exp.quad[None, :]


def e_step_obs(
    x: jnp.ndarray, exp: GmmExpected, dof: float = 4.0
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Responsibilities r (N,K), E[u] (N,K), and per-point evidence (N,)."""
    d = x.shape[-1]
    a0 = b0 = 0.5 * dof
    a = a0 + 0.5 * d
    quad = _quad_form(x, exp)  # (N, K)
    b = b0 + 0.5 * quad
    log_rho = (
        exp.log_pi[None, :]
        + 0.5 * exp.logdet[None, :]
        - 0.5 * d * _LOG_2PI
        + a0 * jnp.log(b0)
        + gammaln(a)
        - gammaln(a0)
        - a * jnp.log(b)
    )
    evidence = jax.nn.logsumexp(log_rho, axis=-1)
    resp = jnp.exp(log_rho - evidence[:, None])
    e_u = a / b  # (N, K)
    return resp, e_u, evidence


def suff_stats_obs(
    x: jnp.ndarray,
    resp: jnp.ndarray,
    e_u: jnp.ndarray,
    scale: float | jnp.ndarray = 1.0,
) -> SmmSuffStats:
    ru = resp * e_u  # (N, K)
    return SmmSuffStats(
        counts=scale * jnp.sum(resp, axis=0),
        u_counts=scale * jnp.sum(ru, axis=0),
        mean_stat=scale
        * jnp.einsum("nk,ni->ki", ru, x, precision=jax.lax.Precision.HIGHEST),
        scatter_stat=scale
        * jnp.einsum("nk,ni,nj->kij", ru, x, x, precision=jax.lax.Precision.HIGHEST),
    )


def stats_to_nat(stats: SmmSuffStats) -> GmmNat:
    """Map SMM stats onto Dirichlet/NIW natural increments (module docstring)."""
    return GmmNat(
        dir_nat=stats.counts,
        niw_nat=NiwNat(
            eta1=stats.mean_stat,
            eta2=stats.u_counts,
            eta3=stats.scatter_stat,
            eta4=stats.counts,
        ),
    )


def elbo_obs(
    x: jnp.ndarray,
    nat: GmmNat,
    prior: GmmNat,
    dof: float = 4.0,
    scale: float | jnp.ndarray = 1.0,
) -> tuple[jnp.ndarray, dict]:
    """SMM evidence lower bound: Σ lse_k log ρ̃ − KL_global.

    The per-point collapse holds because q(u) and q(z) are both at their
    coordinate-ascent optima given the globals (same argument as the GMM's
    Bishop §10.2 rearrangement, applied to the augmented model).
    """
    exp = gmm.expected_params(nat)
    _, _, evidence = e_step_obs(x, exp, dof)
    local = scale * jnp.sum(evidence)
    klg = gmm.kl_global(nat, prior)
    return local - klg, {"local": local, "kl_global": klg}
