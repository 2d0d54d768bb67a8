"""CVI / stochastic natural-gradient updates for conjugate globals (§9.5).

The update  η ← (1−ρ)η + ρ(η₀ + Δ)  is the conjugate-computation VI step of
Khan & Lin (2017): with minibatch-scaled sufficient-statistic increments Δ it
is exactly the natural gradient of the ELBO with respect to the global
natural parameters. Exposed both as a plain function (used inside the jitted
SVAE train step) and as an optax ``GradientTransformation`` so PGM naturals
and NN parameters compose in one optimizer pytree.

Reference counterpart: the recalled natural-gradient assign ops in
``gmm.py``/training scripts (unverified — empty mount, SURVEY.md §0).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


def cvi_update(nat: Any, prior: Any, increment: Any, rho) -> Any:
    """η ← (1−ρ)η + ρ(η₀ + Δ), applied leaf-wise over matching pytrees.

    The increment pytree must already be scaled by N/M (and psum'd across
    the data-parallel mesh — SURVEY.md §9.5 marks this as the psum point).
    """
    return jax.tree.map(
        lambda e, e0, d: (1.0 - rho) * e + rho * (e0 + d), nat, prior, increment
    )


class CviState(NamedTuple):
    step: jax.Array


def cvi(prior: Any, rho: float | optax.Schedule) -> optax.GradientTransformation:
    """CVI as an optax transform over natural-parameter pytrees.

    The "gradient" fed to ``update`` is the sufficient-statistic increment
    pytree Δ (same structure as the params); the emitted update is
    ρ(η₀ + Δ − η), so ``optax.apply_updates`` lands on (1−ρ)η + ρ(η₀+Δ).
    """

    def init_fn(params):
        del params
        import jax.numpy as jnp

        return CviState(step=jnp.zeros((), jnp.int32))

    def update_fn(increment, state, params=None):
        if params is None:
            raise ValueError("cvi requires params (current naturals)")
        rho_t = rho(state.step) if callable(rho) else rho
        updates = jax.tree.map(
            lambda d, e0, e: rho_t * (e0 + d - e), increment, prior, params
        )
        return updates, CviState(step=state.step + 1)

    return optax.GradientTransformation(init_fn, update_fn)
