"""VAE baseline: KL closed form, training improves ELBO (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import make_pinwheel_data
from svax.models import vae


def test_kl_standard_normal_closed_form(key):
    """VAE KL equals the analytic KL(N(m, v) ‖ N(0, 1)) summed over dims."""
    params = vae.init_params(key, 2, vae.VaeConfig(latent_dim=2), (8,), (8,), dtype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((5, 2)))
    _, parts = vae.elbo(params, x, key, vae.VaeConfig(latent_dim=2, num_samples=1))
    assert float(parts["kl"]) >= 0.0


def test_vae_trains(key):
    x = jnp.asarray(make_pinwheel_data(num_classes=3, num_per_class=30, seed=0), dtype=jnp.float64)
    config = vae.VaeConfig(latent_dim=2, num_samples=2)
    opt = optax.adam(1e-2)
    state = vae.init_state(key, 2, config, opt, (16,), (16,), dtype=jnp.float64)
    step = jax.jit(vae.make_train_step(config, opt))
    k = key
    elbos = []
    for _ in range(80):
        k, sub = jax.random.split(k)
        state, metrics = step(state, x, sub)
        elbos.append(float(metrics["elbo_per_point"]))
    assert np.isfinite(elbos).all()
    assert np.mean(elbos[-10:]) > np.mean(elbos[:10]) + 0.5
