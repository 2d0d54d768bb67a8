"""Evaluation bounds: IW ≥ ELBO, Student-t predictive vs scipy oracle."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy import stats as sps

from svax.data import make_pinwheel_data
from svax.models import evaluation, svae, vae
from svax.models.svae import SvaeConfig
from svax.pgm import gmm
from svax.train import svae_step


def test_gmm_predictive_vs_scipy(rng):
    """Mixture-of-Student-t predictive matches a scipy per-component build."""
    k, d = 3, 2
    from svax.expfam import niw

    m = rng.standard_normal((k, d))
    kappa = rng.uniform(0.5, 3.0, k)
    a = rng.standard_normal((k, d, d))
    phi = np.einsum("kij,klj->kil", a, a) + d * np.eye(d)
    nu = rng.uniform(d + 2.0, d + 5.0, k)
    alpha = rng.uniform(0.5, 3.0, k)
    nat = gmm.GmmNat(
        dir_nat=jnp.asarray(alpha - 1.0),
        niw_nat=niw.standard_to_natural(
            niw.NiwStandard(jnp.asarray(m), jnp.asarray(kappa), jnp.asarray(phi), jnp.asarray(nu))
        ),
    )
    x = rng.standard_normal((10, d))
    got = np.asarray(evaluation.gmm_predictive_log_prob(nat, jnp.asarray(x)))

    weights = alpha / alpha.sum()
    dens = np.zeros((10,))
    for j in range(k):
        dof = nu[j] + 1 - d
        shape = (kappa[j] + 1) * phi[j] / (kappa[j] * dof)
        dens += weights[j] * sps.multivariate_t.pdf(x, loc=m[j], shape=shape, df=dof)
    np.testing.assert_allclose(got, np.log(dens), rtol=1e-8)


@pytest.mark.slow
def test_svae_iw_tighter_than_elbo(key):
    """IW bound with many samples ≥ the per-point ELBO (both proper bounds)."""
    x = jnp.asarray(make_pinwheel_data(num_classes=3, num_per_class=20, seed=0), dtype=jnp.float64)
    n = x.shape[0]
    config = SvaeConfig(latent_dim=2, num_components=4, num_samples=2, num_total=n)
    prior = gmm.make_prior(4, 2, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    state = svae_step.init_state(key, 2, config, prior, opt, (16,), (16,), data=x, dtype=jnp.float64)
    step = jax.jit(svae_step.make_train_step(config, prior, opt, rho=0.1))
    k = key
    for _ in range(15):
        k, sub = jax.random.split(k)
        state, _ = step(state, x, sub)

    out = svae.forward(state.nn_params, state.pgm_nat, prior, x, k, config)
    elbo_per_point = (out.recon - out.local_kl) / n  # local bound w/o global KL
    iw = evaluation.svae_iw_loglik(state.nn_params, state.pgm_nat, x, k, config, 256)
    assert float(jnp.mean(iw)) >= float(elbo_per_point / 1.0) - 0.05, (
        float(jnp.mean(iw)),
        float(elbo_per_point),
    )


def test_vae_iw_tighter_than_elbo(key):
    x = jnp.asarray(make_pinwheel_data(num_classes=3, num_per_class=20, seed=1), dtype=jnp.float64)
    config = vae.VaeConfig(latent_dim=2, num_samples=1)
    params = vae.init_params(key, 2, config, (16,), (16,), dtype=jnp.float64)
    elbo, _ = vae.elbo(params, x, key, config)
    iw = evaluation.vae_iw_loglik(params, x, key, config, 256)
    assert float(jnp.mean(iw)) >= float(elbo) - 0.05


def test_iw_monotone_in_samples(key):
    """E[IW_S] is nondecreasing in S (IWAE property) — check 1 vs 64."""
    x = jnp.asarray(make_pinwheel_data(num_classes=3, num_per_class=10, seed=2), dtype=jnp.float64)
    config = vae.VaeConfig(latent_dim=2)
    params = vae.init_params(key, 2, config, (8,), (8,), dtype=jnp.float64)
    iw1 = []
    iw64 = []
    k = key
    for i in range(8):
        k, a, b = jax.random.split(k, 3)
        iw1.append(float(jnp.mean(evaluation.vae_iw_loglik(params, x, a, config, 1))))
        iw64.append(float(jnp.mean(evaluation.vae_iw_loglik(params, x, b, config, 64))))
    assert np.mean(iw64) >= np.mean(iw1) - 1e-3
