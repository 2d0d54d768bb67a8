"""Dirichlet L0 unit tests vs scipy (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps
from scipy.special import digamma as sp_digamma

from svax.expfam import dirichlet


def test_roundtrip(rng):
    alpha = jnp.asarray(rng.uniform(0.1, 5.0, size=(4, 7)))
    back = dirichlet.natural_to_standard(dirichlet.standard_to_natural(alpha))
    np.testing.assert_allclose(np.asarray(back), np.asarray(alpha), rtol=1e-12)


def test_expected_log_pi_vs_scipy(rng):
    alpha = rng.uniform(0.2, 4.0, size=(5,))
    got = np.asarray(dirichlet.expected_log_pi(jnp.asarray(alpha)))
    want = sp_digamma(alpha) - sp_digamma(alpha.sum())
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_log_partition_gradient_identity(rng):
    """∇_η A(η) = E[log π] — the exp-family identity (SURVEY.md §5)."""
    alpha = jnp.asarray(rng.uniform(0.3, 6.0, size=(6,)))
    nat = dirichlet.standard_to_natural(alpha)
    grad = jax.grad(lambda n: dirichlet.log_partition_nat(n))(nat)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(dirichlet.expected_log_pi(alpha)), rtol=1e-8
    )


def test_kl_properties(rng):
    aq = jnp.asarray(rng.uniform(0.5, 3.0, size=(8,)))
    ap = jnp.asarray(rng.uniform(0.5, 3.0, size=(8,)))
    assert float(dirichlet.kl(aq, aq)) == 0.0
    assert float(dirichlet.kl(aq, ap)) >= 0.0


def test_kl_vs_monte_carlo(rng):
    aq = np.array([2.0, 1.0, 3.0])
    ap = np.array([1.5, 1.5, 1.5])
    samples = sps.dirichlet.rvs(aq, size=100_000, random_state=1)
    mc = np.mean(
        sps.dirichlet.logpdf(samples.T, aq) - sps.dirichlet.logpdf(samples.T, ap)
    )
    got = float(dirichlet.kl(jnp.asarray(aq), jnp.asarray(ap)))
    np.testing.assert_allclose(got, mc, rtol=2e-2, atol=5e-3)


def test_log_prob_vs_scipy(rng):
    alpha = np.array([1.2, 0.7, 2.5])
    pi = sps.dirichlet.rvs(alpha, size=4, random_state=2)
    got = np.asarray(dirichlet.log_prob(jnp.asarray(alpha), jnp.asarray(pi)))
    want = np.array([sps.dirichlet.logpdf(p, alpha) for p in pi])
    np.testing.assert_allclose(got, want, rtol=1e-8)
