"""Checkpoint/resume: exact state roundtrip and bit-identical resume."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import make_pinwheel_data
from svax.models.svae import SvaeConfig
from svax.pgm import gmm
from svax.train import svae_step
from svax.train.checkpoint import Checkpointer


def _setup(key):
    x = jnp.asarray(make_pinwheel_data(num_classes=3, num_per_class=20, seed=0), dtype=jnp.float64)
    config = SvaeConfig(latent_dim=2, num_components=3, num_samples=1, num_total=x.shape[0])
    prior = gmm.make_prior(3, 2, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    state = svae_step.init_state(key, 2, config, prior, opt, (8,), (8,), dtype=jnp.float64)
    step = jax.jit(svae_step.make_train_step(config, prior, opt, rho=0.2))
    return x, state, step


def _run(step, state, x, key, n):
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, _ = step(state, x, sub)
    return state, key


def test_exact_resume(tmp_path, key):
    x, state, step = _setup(key)
    k = key

    # Train 5, save, train 5 more → reference final state.
    state5, k5 = _run(step, state, x, k, 5)
    ckpt = Checkpointer(tmp_path / "ckpt")
    ckpt.save(5, state5, k5)
    final_ref, _ = _run(step, state5, x, k5, 5)

    # Restore into a FRESH state and replay the last 5 steps.
    _, fresh, _ = _setup(key)
    restored, k_restored, start = ckpt.restore_or(fresh, key)
    assert start == 5
    final_resumed, _ = _run(step, restored, x, k_restored, 5)
    ckpt.close()

    for a, b in zip(jax.tree.leaves(final_ref.nn_params), jax.tree.leaves(final_resumed.nn_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(final_ref.pgm_nat), jax.tree.leaves(final_resumed.pgm_nat)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_or_passthrough_on_empty(tmp_path, key):
    x, state, _ = _setup(key)
    ckpt = Checkpointer(tmp_path / "empty")
    same, same_key, start = ckpt.restore_or(state, key)
    ckpt.close()
    assert start == 0
    assert same is state
