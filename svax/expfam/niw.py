"""Normal-inverse-Wishart exponential family over (μ, Λ) (SURVEY.md §9.2).

Standard parameters per component: ``(m, κ, Φ, ν)`` with Σ ~ IW(Φ, ν) and
μ|Σ ~ N(m, Σ/κ); equivalently Λ = Σ⁻¹ ~ Wishart(Φ⁻¹, ν), μ|Λ ~ N(m, (κΛ)⁻¹).

Natural parameter convention (SURVEY.md §9.2, matching the recalled
reference/Johnson-SVAE bookkeeping):

    η₁ = κ m          (…, d)
    η₂ = κ            (…)
    η₃ = Φ + κ m mᵀ   (…, d, d)
    η₄ = ν + d + 2    (…)

Under this convention the conjugate update is *additive*: observing Gaussian
sufficient statistics (s₁ = Σ r·E[z], N = Σ r, S₂ = Σ r·E[zzᵀ]) maps to
Δη = (s₁, N, S₂, N) — exactly the CVI increment of SURVEY.md §9.5.

Expected sufficient statistics (in the (Λ, Λμ, μᵀΛμ, log|Λ|) basis):

    E[Λ]      = ν Φ⁻¹
    E[Λμ]     = ν Φ⁻¹ m
    E[μᵀΛμ]   = d/κ + ν mᵀΦ⁻¹m
    E[log|Λ|] = Σ_{i=1..d} ψ((ν+1−i)/2) + d log 2 − log|Φ|

Log-partition:  A = logΓ_d(ν/2) + (νd/2) log2 − (ν/2) log|Φ|
                    − (d/2) log κ + (d/2) log 2π.

The affine map between the storage naturals η and the true naturals λ of the
(Λ, Λμ, μᵀΛμ, log|Λ|) basis is linear:
λ = (−½η₃, η₁, −½η₂, (η₄−2d−2)/2), so ∇_η A = (E[Λμ], −½E[μᵀΛμ], −½E[Λ],
½E[log|Λ|]) — the exp-family identity tested in tests/test_niw.py.

Reference counterpart: recalled ``distributions/niw.py`` (unverified — empty
mount, SURVEY.md §0). One Cholesky of Φ per component drives every
expectation (the batched-K kernel target of SURVEY.md §3b).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax.scipy.special import digamma, multigammaln

from svax.ops import batched_linalg as bl

_LOG_2 = 0.6931471805599453
_LOG_2PI = 1.8378770664093453


class NiwStandard(NamedTuple):
    """Standard NIW parameters, batched over leading axes (components)."""

    m: jnp.ndarray  # (..., d) mean of μ
    kappa: jnp.ndarray  # (...,) mean-precision scale
    phi: jnp.ndarray  # (..., d, d) inverse-Wishart scale matrix
    nu: jnp.ndarray  # (...,) degrees of freedom (> d - 1)


class NiwNat(NamedTuple):
    """Natural NIW parameters (η₁..η₄ of SURVEY.md §9.2)."""

    eta1: jnp.ndarray  # (..., d) = κ m
    eta2: jnp.ndarray  # (...,)   = κ
    eta3: jnp.ndarray  # (..., d, d) = Φ + κ m mᵀ
    eta4: jnp.ndarray  # (...,)   = ν + d + 2


class NiwExpectedStats(NamedTuple):
    """Expected sufficient statistics of q(μ, Λ) — the VMP message content."""

    prec: jnp.ndarray  # (..., d, d)  E[Λ]
    prec_mean: jnp.ndarray  # (..., d) E[Λμ]
    quad: jnp.ndarray  # (...,)       E[μᵀΛμ]
    logdet: jnp.ndarray  # (...,)     E[log|Λ|]


def standard_to_natural(std: NiwStandard) -> NiwNat:
    mm = std.m[..., :, None] * std.m[..., None, :]
    d = std.m.shape[-1]
    return NiwNat(
        eta1=std.kappa[..., None] * std.m,
        eta2=std.kappa,
        eta3=std.phi + std.kappa[..., None, None] * mm,
        eta4=std.nu + d + 2.0,
    )


def natural_to_standard(nat: NiwNat) -> NiwStandard:
    d = nat.eta1.shape[-1]
    kappa = nat.eta2
    m = nat.eta1 / kappa[..., None]
    mm = m[..., :, None] * m[..., None, :]
    phi = nat.eta3 - kappa[..., None, None] * mm
    nu = nat.eta4 - d - 2.0
    return NiwStandard(m=m, kappa=kappa, phi=phi, nu=nu)


def _mv_digamma_sum(nu: jnp.ndarray, d: int) -> jnp.ndarray:
    """Σ_{i=1..d} ψ((ν + 1 − i)/2), unrolled over static d."""
    total = digamma(nu / 2.0)  # i = 1
    for i in range(2, d + 1):
        total = total + digamma((nu + 1.0 - i) / 2.0)
    return total


def expected_stats(std: NiwStandard) -> NiwExpectedStats:
    """Expected sufficient statistics, one Cholesky of Φ per component."""
    d = std.m.shape[-1]
    chol = bl.cholesky(std.phi)
    phi_inv = bl.inv_psd(chol)
    phi_inv_m = bl.cho_solve_vec(chol, std.m)
    nu = std.nu
    prec = nu[..., None, None] * phi_inv
    prec_mean = nu[..., None] * phi_inv_m
    quad = d / std.kappa + nu * jnp.sum(std.m * phi_inv_m, axis=-1)
    logdet = _mv_digamma_sum(nu, d) + d * _LOG_2 - bl.logdet_from_chol(chol)
    return NiwExpectedStats(prec=prec, prec_mean=prec_mean, quad=quad, logdet=logdet)


def expected_stats_nat(nat: NiwNat) -> NiwExpectedStats:
    return expected_stats(natural_to_standard(nat))


def log_partition(std: NiwStandard) -> jnp.ndarray:
    """A(m, κ, Φ, ν) — batched over leading component axes."""
    d = std.m.shape[-1]
    chol = bl.cholesky(std.phi)
    logdet_phi = bl.logdet_from_chol(chol)
    return (
        multigammaln(std.nu / 2.0, d)
        + 0.5 * std.nu * d * _LOG_2
        - 0.5 * std.nu * logdet_phi
        - 0.5 * d * jnp.log(std.kappa)
        + 0.5 * d * _LOG_2PI
    )


def log_partition_nat(nat: NiwNat) -> jnp.ndarray:
    """A(η). ∇_η A = (E[Λμ], −½E[μᵀΛμ], −½E[Λ], ½E[log|Λ|]) — tested."""
    return log_partition(natural_to_standard(nat))


def kl(q: NiwStandard, p: NiwStandard) -> jnp.ndarray:
    """KL(q ‖ p) between NIW distributions via the exp-family Bregman form.

    KL = ⟨λ_q − λ_p, E_q[T]⟩ − A_q + A_p with true naturals
    λ = (−½(Φ+κmmᵀ), κm, −½κ, (ν−d)/2) against statistics
    T = (Λ, Λμ, μᵀΛμ, log|Λ|). Cross-checked in tests against the
    Wishart-KL + expected-Normal-KL decomposition and Monte Carlo.
    """
    stats = expected_stats(q)

    def true_naturals(s: NiwStandard):
        d = s.m.shape[-1]
        mm = s.m[..., :, None] * s.m[..., None, :]
        lam_prec = -0.5 * (s.phi + s.kappa[..., None, None] * mm)
        lam_h = s.kappa[..., None] * s.m
        lam_quad = -0.5 * s.kappa
        lam_ld = 0.5 * (s.nu - d)
        return lam_prec, lam_h, lam_quad, lam_ld

    qp, qh, qq, ql = true_naturals(q)
    pp, ph, pq, pl = true_naturals(p)
    inner = (
        jnp.sum((qp - pp) * stats.prec, axis=(-2, -1))
        + jnp.sum((qh - ph) * stats.prec_mean, axis=-1)
        + (qq - pq) * stats.quad
        + (ql - pl) * stats.logdet
    )
    return inner - log_partition(q) + log_partition(p)


def kl_nat(q: NiwNat, p: NiwNat) -> jnp.ndarray:
    return kl(natural_to_standard(q), natural_to_standard(p))


def sample(key, std: NiwStandard) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Draw (μ, Λ) ~ NIW(m, κ, Φ, ν) via the Bartlett decomposition.

    Λ = L A Aᵀ Lᵀ with L = chol(Φ⁻¹), A lower-triangular with
    A_ii = sqrt(χ²_{ν−i+1}) and N(0,1) strictly-below entries; then
    μ | Λ ~ N(m, (κΛ)⁻¹). Batched over leading component axes. Intended
    for posterior-predictive checks and generation, not the training path.
    """
    import jax

    d = std.m.shape[-1]
    batch = std.m.shape[:-1]
    k_chi, k_norm, k_mu = jax.random.split(key, 3)

    chol_phi = bl.cholesky(std.phi)
    phi_inv = bl.inv_psd(chol_phi)
    chol_v = bl.cholesky(phi_inv)  # L with L Lᵀ = Φ⁻¹

    # Bartlett factor A: diag sqrt(χ²) via Gamma(df/2)·2, normals below.
    dfs = std.nu[..., None] - jnp.arange(d, dtype=std.nu.dtype)  # (..., d)
    chi2 = 2.0 * jax.random.gamma(k_chi, dfs / 2.0, dtype=std.m.dtype)
    diag = jnp.sqrt(chi2)
    normals = jax.random.normal(k_norm, batch + (d, d), dtype=std.m.dtype)
    tril_mask = jnp.tril(jnp.ones((d, d), dtype=std.m.dtype), k=-1)
    a = normals * tril_mask + diag[..., None] * jnp.eye(d, dtype=std.m.dtype)

    hi = jax.lax.Precision.HIGHEST
    la = jnp.einsum("...ij,...jk->...ik", chol_v, a, precision=hi)
    lam = jnp.einsum("...ik,...jk->...ij", la, la, precision=hi)

    # μ | Λ ~ N(m, (κΛ)⁻¹): backsolve with chol(κΛ).
    chol_kl = bl.cholesky(std.kappa[..., None, None] * lam)
    eps = jax.random.normal(k_mu, std.m.shape, dtype=std.m.dtype)
    mu = std.m + bl.solve_triu_vec(chol_kl, eps)
    return mu, lam
