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


# ------------------------- megakernel engines × checkpoint/resume ----------
#
# The megakernel runners fold state.step into their PRNG seed
# (svax/ops/tinystep_pallas.py train_chunk, flexstep_pallas.py ditto)
# precisely so a resumed chunk draws the SAME noise the uninterrupted
# run's chunk at that step would — making checkpoint/resume bit-exact.
# These tests pin that contract for all three whole-train-step kernels
# (interpret mode on CPU; the seed-fold math is platform-independent).


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x1, x2 in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def _mega_setup(seed=0, k=3, n=48, s=2, latent=2, hidden=(8, 8)):
    from svax.data import make_pinwheel_data as mk

    x = jnp.asarray(mk(num_classes=3, num_per_class=n // 3, seed=0)[:n],
                    jnp.float32)
    config = SvaeConfig(latent_dim=latent, num_components=k, num_samples=s,
                        num_total=n)
    prior = jax.tree.map(lambda a: a.astype(jnp.float32),
                         gmm.make_prior(k, latent, kappa=0.05))
    opt = optax.adam(3e-3)
    state = svae_step.init_state(jax.random.PRNGKey(seed), 2, config, prior,
                                 opt, hidden, hidden, data=x)
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state
    )
    return x, config, prior, opt, state


def _resume_roundtrip(tmp_path, runner, state0, fresh, x, seed):
    """Uninterrupted (two chunks) vs chunk → orbax save → restore → chunk."""
    ref, _ = runner(state0, x, 4, seed=seed)
    ref, _ = runner(ref, x, 4, seed=seed)

    half, _ = runner(state0, x, 4, seed=seed)
    ckpt = Checkpointer(tmp_path / "ck")
    ckpt.save(4, half, jax.random.PRNGKey(1))
    restored, _, start = ckpt.restore_or(fresh, jax.random.PRNGKey(9))
    ckpt.close()
    assert start == 4
    resumed, _ = runner(restored, x, 4, seed=seed)
    _assert_trees_equal(ref, resumed)
    return restored, resumed


def test_megakernel_resume_tinystep(tmp_path):
    """Headline (tinystep) engine: resume through orbax is bit-identical —
    NN params, Adam moments, PGM naturals, step counter (VERDICT r4 #1)."""
    from svax.train.loop import make_megakernel_runner

    x, config, prior, opt, state0 = _mega_setup()
    runner = make_megakernel_runner(
        config, prior, lr=3e-3, rho=0.2,
        encoder_hidden=(8, 8), decoder_hidden=(8, 8),
    )
    _, _, _, _, fresh = _mega_setup()
    restored, resumed = _resume_roundtrip(tmp_path, runner, state0, fresh, x, seed=5)
    assert int(resumed.step) == 8
    # The seed actually reaches the noise stream: a different seed on the
    # resumed chunk must change the result (guards against a degenerate
    # pass where eps is ignored).
    alt, _ = runner(restored, x, 4, seed=6)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(alt.nn_params),
                        jax.tree.leaves(resumed.nn_params))
    )


def test_megakernel_resume_flexstep(tmp_path):
    """flexstep engine (minibatch + rho decay): the streamed batch stack
    and augmentation keys also fold state.step, so resume is bit-exact
    including the minibatch index draw."""
    from svax.train.loop import make_megakernel_runner

    x, config, prior, opt, state0 = _mega_setup(latent=3)
    runner = make_megakernel_runner(
        config, prior, lr=3e-3, rho=0.2, rho_decay=0.01, batch_size=16,
        encoder_hidden=(8, 8), decoder_hidden=(8, 8),
    )
    _, _, _, _, fresh = _mega_setup(latent=3)
    _, resumed = _resume_roundtrip(tmp_path, runner, state0, fresh, x, seed=3)
    assert int(resumed.step) == 8


def test_megakernel_resume_mixstep(tmp_path):
    """Mixture (GMM) megakernel: deterministic step, so resume parity AND
    chunk-split invariance (one 8-step launch == two 4-step launches)."""
    from svax.data import make_pinwheel_data as mk
    from svax.models import gmm_baseline
    from svax.train.loop import make_mixture_megakernel_runner

    x = jnp.asarray(mk(num_classes=3, num_per_class=16, seed=0), jnp.float32)
    prior = jax.tree.map(lambda a: a.astype(jnp.float32),
                         gmm.make_prior(4, 2, kappa=0.05))
    state0 = gmm_baseline.init_state(jax.random.PRNGKey(0), prior, x)
    runner = make_mixture_megakernel_runner(prior, rho=0.2)
    fresh = gmm_baseline.init_state(jax.random.PRNGKey(7), prior, x)
    _, resumed = _resume_roundtrip(tmp_path, runner, state0, fresh, x, seed=0)
    assert int(resumed.step) == 8
    one_shot, _ = runner(state0, x, 8, seed=0)
    _assert_trees_equal(one_shot, resumed)
