"""Device-resident training loops (TPU-first, SURVEY.md §8 hard part #5).

On TPU the per-step host dispatch can dominate a sub-millisecond step, so
the benchmark/training hot path runs K steps inside ONE jitted
``lax.scan`` — data stays in HBM, the CVI update and Adam update fuse into
the same program, and the host only sees the final state plus stacked
metrics. This is the idiomatic XLA replacement for the reference's
``session.run`` per-step loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def make_scan_runner(step: Callable, num_steps: int) -> Callable:
    """Compile ``num_steps`` applications of ``step(state, batch, key)``.

    Returns runner(state, x, key) → (state, metrics-pytree stacked over
    steps). The same full batch is used each step (the reference's
    full-batch pinwheel regime); minibatching is handled by the caller
    passing a (num_steps, M, D) batch stack instead.
    """

    def body(carry, key):
        state, x = carry
        state, metrics = step(state, x, key)
        return (state, x), metrics

    @jax.jit
    def runner(state, x, key):
        keys = jax.random.split(key, num_steps)
        (state, _), metrics = jax.lax.scan(body, (state, x), keys)
        return state, metrics

    return runner


def augment_step(step: Callable, sigma: float) -> Callable:
    """Wrap ``step(state, xb, key)`` with input-noise augmentation.

    Each call splits the key and trains on ``xb + sigma·N(0, I)`` — the
    seed-robustness recipe (BASELINE.md seed table). ``sigma <= 0``
    returns ``step`` unchanged, so callers can wire the flag through
    unconditionally. Single definition for every consumer
    (train_svae CLI, seed_sweep, latent-contamination demo): the key
    discipline — split BEFORE the step, noise from the first half — is
    part of the recipe and must not drift between them.
    """
    if sigma <= 0.0:
        return step

    def wrapped(state, xb, key):
        k1, k2 = jax.random.split(key)
        return step(state, xb + sigma * jax.random.normal(k1, xb.shape,
                                                          xb.dtype), k2)

    return wrapped


def make_minibatch_scan_runner(step: Callable, num_steps: int) -> Callable:
    """Scan over a precomputed (num_steps, M, D) stack of minibatches."""

    def body(state, inp):
        xb, key = inp
        state, metrics = step(state, xb, key)
        return state, metrics

    @jax.jit
    def runner(state, batches, key):
        keys = jax.random.split(key, num_steps)
        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, metrics

    return runner
