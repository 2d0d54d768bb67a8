"""Gaussian information-form L0 tests vs scipy (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from svax.expfam import mvn
from svax.ops import batched_linalg as bl


def random_cov(rng, batch, d):
    a = rng.standard_normal(batch + (d, d))
    return np.einsum("...ij,...kj->...ik", a, a) + d * np.eye(d)


def test_roundtrip(rng):
    d = 3
    mu = rng.standard_normal((5, d))
    cov = random_cov(rng, (5,), d)
    nat = mvn.standard_to_natural(jnp.asarray(mu), jnp.asarray(cov))
    mu2, cov2 = mvn.natural_to_standard(nat)
    np.testing.assert_allclose(np.asarray(mu2), mu, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cov2), cov, rtol=1e-8, atol=1e-10)


def test_log_prob_vs_scipy(rng):
    d = 4
    mu = rng.standard_normal(d)
    cov = random_cov(rng, (), d)
    x = rng.standard_normal((6, d))
    nat = mvn.standard_to_natural(jnp.asarray(mu), jnp.asarray(cov))
    got = np.asarray(mvn.log_prob(nat, jnp.asarray(x)))
    want = sps.multivariate_normal.logpdf(x, mu, cov)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_sample_from_precision_moments(key, rng):
    d = 2
    mu = jnp.asarray(rng.standard_normal(d))
    cov = jnp.asarray(random_cov(rng, (), d))
    nat = mvn.standard_to_natural(mu, cov)
    prec_chol = bl.cholesky(nat.prec)
    z = mvn.sample_from_precision(key, mu, prec_chol, shape_prefix=(100_000,))
    np.testing.assert_allclose(np.asarray(z.mean(0)), np.asarray(mu), atol=2e-2)
    emp_cov = np.cov(np.asarray(z).T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), rtol=0, atol=5e-2)


def test_sample_gradients_flow(key):
    """Reparameterization gradients flow through mean AND precision chol."""
    d = 2
    mu = jnp.zeros(d)
    prec = jnp.eye(d) * 2.0

    def loss(p):
        chol = bl.cholesky(p)
        z = mvn.sample_from_precision(key, mu, chol, shape_prefix=(16,))
        return jnp.sum(z**2)

    g = jax.grad(loss)(prec)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0.0


def test_kl_vs_closed_form(rng):
    """Bregman-form Gaussian KL equals the textbook trace/logdet formula."""
    d = 3
    mq = rng.standard_normal(d)
    mp = rng.standard_normal(d)
    cq = random_cov(rng, (), d)
    cp = random_cov(rng, (), d)
    got = float(
        mvn.kl(
            mvn.standard_to_natural(jnp.asarray(mq), jnp.asarray(cq)),
            mvn.standard_to_natural(jnp.asarray(mp), jnp.asarray(cp)),
        )
    )
    cpinv = np.linalg.inv(cp)
    diff = mp - mq
    want = 0.5 * (
        np.trace(cpinv @ cq)
        + diff @ cpinv @ diff
        - d
        + np.linalg.slogdet(cp)[1]
        - np.linalg.slogdet(cq)[1]
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)
    assert float(
        mvn.kl(
            mvn.standard_to_natural(jnp.asarray(mq), jnp.asarray(cq)),
            mvn.standard_to_natural(jnp.asarray(mq), jnp.asarray(cq)),
        )
    ) < 1e-10


def test_product_of_gaussians_normalizer(rng):
    """A(h1+h2, J1+J2) − A1 − A2 = log ∫ N1·N2 (checked in 1-D closed form)."""
    m1, v1, m2, v2 = 0.3, 1.5, -0.7, 0.8
    n1 = mvn.standard_to_natural(jnp.array([m1]), jnp.array([[v1]]))
    n2 = mvn.standard_to_natural(jnp.array([m2]), jnp.array([[v2]]))
    joint = mvn.GaussianNat(h=n1.h + n2.h, prec=n1.prec + n2.prec)
    got = float(
        mvn.log_partition(joint) - mvn.log_partition(n1) - mvn.log_partition(n2)
    )
    want = sps.norm.logpdf(m1, m2, np.sqrt(v1 + v2))
    np.testing.assert_allclose(got, want, rtol=1e-8)
