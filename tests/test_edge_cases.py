"""Edge-case hardening: degenerate dimensions, empty clusters, extremes."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import make_pinwheel_data
from svax.models import gmm_baseline, svae
from svax.models.svae import SvaeConfig
from svax.pgm import gmm
from svax.train import svae_step


def test_single_component_gmm(rng):
    """K=1: degenerate mixture still trains (softmax over one logit)."""
    x = jnp.asarray(rng.standard_normal((40, 2)) + 3.0)
    prior = gmm.make_prior(1, 2, dtype=jnp.float64)
    state = gmm_baseline.init_state(jax.random.PRNGKey(0), prior, x)
    step = jax.jit(gmm_baseline.make_train_step(prior, 1.0, 40))
    for _ in range(10):
        state, metrics = step(state, x)
    assert np.isfinite(float(metrics["elbo"]))
    from svax.expfam import niw

    std = niw.natural_to_standard(state.nat.niw_nat)
    np.testing.assert_allclose(np.asarray(std.m[0]), np.asarray(x.mean(0)), atol=0.3)


def test_one_dimensional_latent(key):
    """d=1: the unrolled linalg and combine work at the smallest dimension."""
    x = jnp.asarray(
        make_pinwheel_data(num_classes=3, num_per_class=10, seed=0), dtype=jnp.float64
    )
    config = SvaeConfig(latent_dim=1, num_components=3, num_samples=2, num_total=30)
    prior = gmm.make_prior(3, 1, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    state = svae_step.init_state(key, 2, config, prior, opt, (8,), (8,), dtype=jnp.float64)
    step = jax.jit(svae_step.make_train_step(config, prior, opt, rho=0.2))
    state, metrics = step(state, x, key)
    assert np.isfinite(float(metrics["elbo"]))


def test_empty_cluster_stays_at_prior(rng):
    """A component that never gets responsibility converges to the prior."""
    x = jnp.asarray(rng.standard_normal((60, 2)) * 0.1 + 10.0)
    prior = gmm.make_prior(4, 2, dtype=jnp.float64)
    # Initialize one component far away with minuscule pseudo-count weight.
    nat = gmm.init_variational(jax.random.PRNGKey(0), prior, x, pseudo_counts=1.0)
    state = gmm_baseline.GmmTrainState(nat=nat, step=jnp.zeros((), jnp.int32))
    step = jax.jit(gmm_baseline.make_train_step(prior, 1.0, 60))
    for _ in range(50):
        state, _ = step(state, x)
    from svax.expfam import dirichlet

    alpha = dirichlet.natural_to_standard(state.nat.dir_nat)
    resp, _ = gmm.e_step_obs(x, gmm.expected_params(state.nat))
    counts = np.asarray(resp.sum(0))
    empty = counts < 1.0
    if empty.any():
        # ρ=1 full-batch: empty components sit exactly at the prior.
        np.testing.assert_allclose(
            np.asarray(alpha)[empty], np.asarray(
                dirichlet.natural_to_standard(prior.dir_nat))[empty] + counts[empty],
            rtol=1e-6,
        )
    assert np.isfinite(float(gmm.elbo_obs(x, state.nat, prior)[0]))


@pytest.mark.slow
def test_many_samples_path(key):
    """S=16 Monte-Carlo samples: shapes and gradients stay sane."""
    x = jnp.asarray(
        make_pinwheel_data(num_classes=3, num_per_class=8, seed=1), dtype=jnp.float64
    )
    config = SvaeConfig(latent_dim=2, num_components=3, num_samples=16, num_total=24)
    prior = gmm.make_prior(3, 2, dtype=jnp.float64)
    nn = svae.init_params(key, 2, config, (8,), (8,), dtype=jnp.float64)
    nat = gmm.init_variational(key, prior, x)
    out = svae.forward(nn, nat, prior, x, key, config)
    assert np.isfinite(float(out.elbo))
    g = jax.grad(lambda p: -svae.forward(p, nat, prior, x, key, config).elbo)(nn)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_huge_precision_potential_with_jitter(rng, key):
    """Near-singular combines survive when jitter is enabled."""
    from svax.models.svae import sin_combine

    n, k, d = 5, 3, 2
    nat = gmm.make_prior(k, d, dtype=jnp.float64)
    nat_q = gmm.init_variational(key, nat)
    exp = gmm.expected_params(nat_q)
    pot_p = jnp.full((n, d), 1e12)  # encoder variance floor regime
    pot_h = jnp.asarray(rng.standard_normal((n, d))) * 1e6
    post = sin_combine(pot_h, pot_p, exp, jitter=1e-6)
    assert np.isfinite(np.asarray(post.log_resp)).all()
    assert np.isfinite(np.asarray(post.mean)).all()
