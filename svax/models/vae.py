"""Plain VAE baseline (SURVEY.md §3a, §4.3): same encoder/decoder nets,
N(0, I) latent prior, standard reparameterized ELBO, Adam on everything.

Kept deliberately minimal — it exists so the SVAE's structured prior can be
compared against the unstructured baseline on identical architectures, as in
the reference's recalled ``vae.py``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from svax.nets import mlp as nets

_LOG_2PI = 1.8378770664093453


class VaeConfig(NamedTuple):
    latent_dim: int
    num_samples: int = 1
    likelihood: str = "gaussian"
    activation: Callable = jnp.tanh


class VaeTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def init_params(
    key: jax.Array,
    input_dim: int,
    config: VaeConfig,
    encoder_hidden=(50, 50),
    decoder_hidden=(50, 50),
    dtype=jnp.float32,
) -> dict:
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": nets.encoder_init(
            k_enc, input_dim, encoder_hidden, config.latent_dim, dtype=dtype
        ),
        "decoder": nets.decoder_init(
            k_dec, config.latent_dim, decoder_hidden, input_dim, config.likelihood, dtype=dtype
        ),
    }


def elbo(params: dict, x: jnp.ndarray, key: jax.Array, config: VaeConfig):
    """Per-batch mean ELBO: E_q[log p(x|z)] − KL(q(z|x) ‖ N(0, I))."""
    pot_h, pot_p = nets.encoder_apply(params["encoder"], x, config.activation)
    var = 1.0 / pot_p
    mean = pot_h * var
    eps = jax.random.normal(
        key, (config.num_samples,) + mean.shape, dtype=mean.dtype
    )
    z = mean[None] + jnp.sqrt(var)[None] * eps
    loglik = nets.log_likelihood(
        params["decoder"], z, x[None], config.likelihood, config.activation
    )  # (S, N)
    recon = jnp.mean(loglik, axis=0)
    kl = 0.5 * jnp.sum(mean**2 + var - jnp.log(var) - 1.0, axis=-1)
    per_point = recon - kl
    return jnp.mean(per_point), {
        "recon": jnp.mean(recon),
        "kl": jnp.mean(kl),
    }


def init_state(
    key: jax.Array,
    input_dim: int,
    config: VaeConfig,
    optimizer: optax.GradientTransformation,
    encoder_hidden=(50, 50),
    decoder_hidden=(50, 50),
    dtype=jnp.float32,
) -> VaeTrainState:
    params = init_params(key, input_dim, config, encoder_hidden, decoder_hidden, dtype)
    return VaeTrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    config: VaeConfig,
    optimizer: optax.GradientTransformation,
    axis_name: str | None = None,
) -> Callable:
    def step(state: VaeTrainState, batch: jnp.ndarray, key: jax.Array):
        def loss_fn(params):
            value, parts = elbo(params, batch, key, config)
            return -value, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            parts = jax.lax.pmean(parts, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"elbo_per_point": -loss, **parts}
        return VaeTrainState(params, opt_state, state.step + 1), metrics

    return step
