"""NIW L0 tests: roundtrips, scipy Monte-Carlo oracles, grad-of-A identity.

The gradient-of-log-partition test is the strong defense against the #1
ranked hard part in SURVEY.md §8: a silent sign/offset error in the NIW
natural-parameter convention breaking conjugacy.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from svax.expfam import niw


def make_std(rng, d, k=()):
    m = rng.standard_normal(k + (d,))
    kappa = rng.uniform(0.5, 3.0, size=k)
    a = rng.standard_normal(k + (d, d))
    phi = np.einsum("...ij,...kj->...ik", a, a) + d * np.eye(d)
    nu = rng.uniform(d + 2.0, d + 6.0, size=k)
    return niw.NiwStandard(
        m=jnp.asarray(m), kappa=jnp.asarray(kappa), phi=jnp.asarray(phi), nu=jnp.asarray(nu)
    )


def test_roundtrip(rng):
    std = make_std(rng, 3, (5,))
    back = niw.natural_to_standard(niw.standard_to_natural(std))
    for a, b in zip(std, back):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9, atol=1e-10)


def _sample_niw(std, n, seed):
    """Sample (μ, Λ) from NIW via scipy: Λ~W(Φ⁻¹,ν), μ|Λ~N(m,(κΛ)⁻¹)."""
    rng = np.random.default_rng(seed)
    m = np.asarray(std.m)
    kappa = float(std.kappa)
    phi = np.asarray(std.phi)
    nu = float(std.nu)
    lam = sps.wishart.rvs(df=nu, scale=np.linalg.inv(phi), size=n, random_state=rng)
    cov = np.linalg.inv(kappa * lam)
    chol = np.linalg.cholesky(cov)
    eps = rng.standard_normal((n, m.shape[0]))
    mus = m + np.einsum("nij,nj->ni", chol, eps)
    return mus, lam


def test_expected_stats_vs_monte_carlo(rng):
    d = 2
    std = make_std(rng, d)
    stats = niw.expected_stats(std)
    mus, lams = _sample_niw(std, 30_000, seed=3)
    np.testing.assert_allclose(np.asarray(stats.prec), lams.mean(0), rtol=3e-2)
    np.testing.assert_allclose(
        np.asarray(stats.prec_mean),
        np.einsum("nij,nj->ni", lams, mus).mean(0),
        rtol=5e-2,
        atol=5e-2,
    )
    np.testing.assert_allclose(
        float(stats.quad),
        np.einsum("ni,nij,nj->n", mus, lams, mus).mean(),
        rtol=5e-2,
    )
    np.testing.assert_allclose(
        float(stats.logdet),
        np.mean(np.linalg.slogdet(lams)[1]),
        rtol=5e-2,
        atol=2e-2,
    )


def test_grad_log_partition_identity(rng):
    """∇_η A = (E[Λμ], −½E[μᵀΛμ], −½E[Λ], ½E[log|Λ|]) (SURVEY.md §5/§8)."""
    d = 3
    std = make_std(rng, d)
    nat = niw.standard_to_natural(std)
    grads = jax.grad(lambda n: jnp.sum(niw.log_partition_nat(n)))(nat)
    stats = niw.expected_stats(std)
    np.testing.assert_allclose(np.asarray(grads.eta1), np.asarray(stats.prec_mean), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(grads.eta2), -0.5 * np.asarray(stats.quad), rtol=1e-7)
    # The unrolled Cholesky reads only the lower triangle of η₃, so JAX folds
    # the symmetric-matrix derivative there; symmetrize to compare.
    g3 = np.asarray(grads.eta3)
    g3 = 0.5 * (g3 + g3.swapaxes(-1, -2))
    np.testing.assert_allclose(g3, -0.5 * np.asarray(stats.prec), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(grads.eta4), 0.5 * np.asarray(stats.logdet), rtol=1e-7)


def test_kl_properties(rng):
    q = make_std(rng, 3, (4,))
    p = make_std(rng, 3, (4,))
    np.testing.assert_allclose(np.asarray(niw.kl(q, q)), 0.0, atol=1e-8)
    assert np.all(np.asarray(niw.kl(q, p)) >= 0.0)


def _niw_logpdf(mu, lam, std):
    kappa = float(std.kappa)
    nu = float(std.nu)
    phi = np.asarray(std.phi)
    m = np.asarray(std.m)
    lp_w = sps.wishart.logpdf(lam, df=nu, scale=np.linalg.inv(phi))
    cov = np.linalg.inv(kappa * lam)
    lp_n = sps.multivariate_normal.logpdf(mu, m, cov)
    return lp_w + lp_n


def test_kl_vs_monte_carlo(rng):
    d = 2
    q = make_std(rng, d)
    p = make_std(rng, d)
    mus, lams = _sample_niw(q, 20_000, seed=4)
    diffs = np.array(
        [_niw_logpdf(mus[i], lams[i], q) - _niw_logpdf(mus[i], lams[i], p) for i in range(2000)]
    )
    got = float(niw.kl(q, p))
    mc = diffs.mean()
    se = diffs.std() / np.sqrt(len(diffs))
    assert abs(got - mc) < 5 * se + 0.02 * abs(mc)


def test_conjugate_additive_update(rng):
    """η_post = η₀ + (s₁, N, S₂, N) reproduces textbook NIW posterior."""
    d = 2
    n = 50
    x = rng.standard_normal((n, d)) + np.array([1.0, -2.0])
    prior = niw.NiwStandard(
        m=jnp.zeros(d), kappa=jnp.asarray(0.5), phi=jnp.eye(d) * 2.0, nu=jnp.asarray(d + 2.0)
    )
    nat0 = niw.standard_to_natural(prior)
    s1 = jnp.asarray(x.sum(0))
    s2 = jnp.asarray(np.einsum("ni,nj->ij", x, x))
    post_nat = niw.NiwNat(
        eta1=nat0.eta1 + s1,
        eta2=nat0.eta2 + n,
        eta3=nat0.eta3 + s2,
        eta4=nat0.eta4 + n,
    )
    post = niw.natural_to_standard(post_nat)
    # Textbook (Murphy, "Conjugate Bayesian analysis of the Gaussian"):
    xbar = x.mean(0)
    kappa_n = 0.5 + n
    m_n = (0.5 * np.zeros(d) + n * xbar) / kappa_n
    s_centered = np.einsum("ni,nj->ij", x - xbar, x - xbar)
    phi_n = (
        2.0 * np.eye(d)
        + s_centered
        + (0.5 * n / kappa_n) * np.outer(xbar, xbar)
    )
    np.testing.assert_allclose(float(post.kappa), kappa_n, rtol=1e-12)
    np.testing.assert_allclose(float(post.nu), d + 2.0 + n, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(post.m), m_n, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(post.phi), phi_n, rtol=1e-9)
