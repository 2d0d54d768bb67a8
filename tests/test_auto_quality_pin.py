"""Reduced-scale quality regression pins for the auto (small-d Gaussian
minibatch) config family — VERDICT r4 #7.

The auto-svae config had throughput coverage and step-level oracle parity
(tests/test_flexstep_kernel.py) but no end-quality gate: a math
regression that degraded end-of-training quality while keeping per-step
parity plausible (e.g. a broken rho schedule, noise-stream bug, or eval
change) could pass CI. Two pins, both on the deterministic auto fixture
surrogate (352×8, `source: surrogate-gmm`):

* the XLA path at the shipped recipe shape (d=4, hidden (100,100),
  batch 64, rho 0.2 with 1e-3 inverse decay) — measured test ELBO/pt
  −16.57 at init → −11.86 at 1000 steps (CPU f64 harness, 2026-08-20);
* the FLEXSTEP megakernel engine (interpret mode off-TPU) at a reduced
  width that keeps the interpreter fast — measured −17.36 → −12.50 in
  300 steps.

Thresholds carry ~0.5–0.7 nat slack below the measured values; the
discriminating failure mode (training barely moves the held-out ELBO)
lands 4+ nats away.
"""

import pytest
import jax
import jax.numpy as jnp
import optax

from svax.data import load_dataset
from svax.models.svae import SvaeConfig
from svax.pgm import gmm
from svax.train import svae_step
from svax.train.loop import make_megakernel_runner, make_minibatch_scan_runner

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _auto():
    train, test, meta = load_dataset("auto", seed=0)
    assert meta["synthetic"] is True  # the pin is against the fixture
    return (jnp.asarray(train, jnp.float32), jnp.asarray(test, jnp.float32))


def test_auto_path_quality_pin():
    x, xt = _auto()
    n = x.shape[0]
    config = SvaeConfig(latent_dim=4, num_components=10, num_samples=4,
                        num_total=n)
    prior = gmm.make_prior(10, 4, kappa=0.05)
    opt = optax.adam(1e-3)
    rho = lambda t: 0.2 / (1.0 + 0.001 * t.astype(jnp.float32))  # noqa: E731
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(key, x.shape[1], config, prior, opt,
                                 (100, 100), (100, 100), data=x)
    eval_fn = jax.jit(svae_step.make_eval_fn(config, prior))
    ev0 = float(eval_fn(state, xt, jax.random.PRNGKey(99))["elbo_per_point"])

    step = svae_step.make_train_step(config, prior, opt, rho=rho)
    chunk = 250
    runner = make_minibatch_scan_runner(step, chunk)
    kk = key
    for c in range(4):  # 1000 steps
        kk = jax.random.fold_in(kk, c)
        kb, kr = jax.random.split(kk)
        idx = jax.random.randint(kb, (chunk, 64), 0, n)
        state, _m = runner(state, x[idx], kr)

    ev = float(eval_fn(state, xt, jax.random.PRNGKey(99))["elbo_per_point"])
    assert ev > ev0 + 4.0, f"training barely moved held-out ELBO: {ev0} -> {ev}"
    assert ev > -12.3, f"auto-config quality regression: test ELBO/pt {ev}"


def test_flexstep_engine_quality_pin():
    """End-quality gate THROUGH the flexstep megakernel (interpret mode):
    oracle parity alone cannot catch a regression in the engine's own
    noise/minibatch/rho-schedule streams that degrades where training
    lands — this asserts where it lands."""
    x, xt = _auto()
    n = x.shape[0]
    config = SvaeConfig(latent_dim=4, num_components=10, num_samples=2,
                        num_total=n)
    prior = jax.tree.map(lambda a: a.astype(jnp.float32),
                         gmm.make_prior(10, 4, kappa=0.05))
    opt = optax.adam(1e-3)
    state = svae_step.init_state(jax.random.PRNGKey(0), x.shape[1], config,
                                 prior, opt, (24, 24), (24, 24), data=x)
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state
    )
    runner = make_megakernel_runner(
        config, prior, lr=1e-3, rho=0.2, rho_decay=0.001, batch_size=64,
        encoder_hidden=(24, 24), decoder_hidden=(24, 24),
    )
    eval_fn = jax.jit(svae_step.make_eval_fn(config, prior))
    ev0 = float(eval_fn(state, xt, jax.random.PRNGKey(99))["elbo_per_point"])
    for _ in range(3):
        state, _m = runner(state, x, 100, seed=0)
    ev = float(eval_fn(state, xt, jax.random.PRNGKey(99))["elbo_per_point"])
    assert int(state.step) == 300
    assert ev > ev0 + 4.0, f"flexstep barely moved held-out ELBO: {ev0} -> {ev}"
    assert ev > -13.2, f"flexstep quality regression: test ELBO/pt {ev}"
