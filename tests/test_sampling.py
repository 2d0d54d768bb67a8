"""Generative sampling: Bartlett NIW draws vs expected moments, GMM ancestral
sampling recovers the posterior structure, SVAE generation round-trip."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from svax.data import make_pinwheel_data
from svax.expfam import dirichlet, niw
from svax.models import gmm_baseline, svae
from svax.models.svae import SvaeConfig
from svax.pgm import gmm


def test_dirichlet_sample_moments(key):
    alpha = jnp.asarray([2.0, 1.0, 3.0])
    pi = dirichlet.sample(key, alpha, shape=(50_000,))
    np.testing.assert_allclose(
        np.asarray(pi.mean(0)), np.asarray(alpha / alpha.sum()), atol=3e-3
    )


def test_niw_bartlett_sample_moments(key, rng):
    d = 2
    a = rng.standard_normal((d, d))
    std = niw.NiwStandard(
        m=jnp.asarray(rng.standard_normal(d)),
        kappa=jnp.asarray(1.5),
        phi=jnp.asarray(a @ a.T + d * np.eye(d)),
        nu=jnp.asarray(7.0),
    )
    batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (30_000,) + x.shape), std)
    mu, lam = niw.sample(key, batched)
    stats = niw.expected_stats(std)
    np.testing.assert_allclose(
        np.asarray(lam.mean(0)), np.asarray(stats.prec), rtol=5e-2, atol=1e-2
    )
    np.testing.assert_allclose(np.asarray(mu.mean(0)), np.asarray(std.m), atol=4e-2)
    elogdet = np.mean(np.linalg.slogdet(np.asarray(lam))[1])
    np.testing.assert_allclose(elogdet, float(stats.logdet), rtol=3e-2, atol=2e-2)


@pytest.mark.slow
def test_gmm_generative_after_fit(key):
    x = jnp.asarray(make_pinwheel_data(num_classes=3, num_per_class=50, seed=0))
    prior = gmm.make_prior(5, 2, dtype=jnp.float64)
    state = gmm_baseline.init_state(key, prior, x)
    step = jax.jit(gmm_baseline.make_train_step(prior, 1.0, x.shape[0]))
    for _ in range(40):
        state, _ = step(state, x)
    xs, labels = gmm.sample_generative(key, state.nat, 2000, sample_params=True)
    assert xs.shape == (2000, 2)
    assert np.isfinite(np.asarray(xs)).all()
    # Generated data should live in the same region as the training data.
    assert abs(float(xs.mean(0)[0]) - float(x.mean(0)[0])) < 3.0
    spread = np.linalg.norm(np.asarray(xs).std(0) - np.asarray(x).std(0))
    assert spread < 5.0, spread


def test_svae_generate_shapes(key):
    config = SvaeConfig(latent_dim=2, num_components=4, num_samples=1, num_total=10)
    nn = svae.init_params(key, 2, config, (8,), (8,), dtype=jnp.float64)
    prior = gmm.make_prior(4, 2, dtype=jnp.float64)
    nat = gmm.init_variational(key, prior)
    x, z, labels = svae.generate(nn, nat, key, 64, config)
    assert x.shape == (64, 2) and z.shape == (64, 2) and labels.shape == (64,)
    assert np.isfinite(np.asarray(x)).all()


def test_svae_generate_bernoulli(key):
    config = SvaeConfig(
        latent_dim=3, num_components=4, likelihood="bernoulli", num_total=10
    )
    nn = svae.init_params(key, 12, config, (8,), (8,), dtype=jnp.float64)
    prior = gmm.make_prior(4, 3, dtype=jnp.float64)
    nat = gmm.init_variational(key, prior)
    probs, z, _ = svae.generate(nn, nat, key, 16, config)
    assert probs.shape == (16, 12)
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
