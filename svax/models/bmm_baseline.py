"""Bernoulli-mixture baseline trained by natural-gradient VMP.

The third model for the MNIST column of the paper's comparison table
(SURVEY.md §1; VERDICT r4 #5): same CVI machinery as the pure-GMM baseline
(``gmm_baseline.py``, SURVEY.md §4.2 call stack) over the Beta–Bernoulli
conjugate pair (``svax.pgm.bmm``). One jitted step = E-step → scaled
sufficient statistics → (optional psum across a data mesh) → CVI update —
structurally identical to the GMM step so the Trainer engine, DP wrapper,
and metric conventions carry over unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from svax.pgm import bmm, natgrad
from svax.pgm.bmm import BmmNat


class BmmTrainState(NamedTuple):
    nat: BmmNat
    step: jnp.ndarray


def init_state(
    key: jax.Array, prior: BmmNat, data=None, pseudo_counts: float = 2.0
) -> BmmTrainState:
    nat = bmm.init_variational(key, prior, data, pseudo_counts=pseudo_counts)
    return BmmTrainState(nat=nat, step=jnp.zeros((), jnp.int32))


def make_train_step(
    prior: BmmNat,
    rho: float | Callable,
    num_total: int,
    axis_name: str | None = None,
) -> Callable:
    """Build the jittable Bernoulli-mixture CVI step.

    Same contract as ``gmm_baseline.make_train_step``: batch stats scaled
    by N/M_global (SURVEY.md §9.5), psum'd over ``axis_name`` when running
    inside shard_map over a data mesh, and both ELBO terms evaluated at
    the same pre-update naturals.
    """

    def step(state: BmmTrainState, batch: jnp.ndarray):
        exp = bmm.expected_params(state.nat)
        m_local = batch.shape[0]
        if axis_name is not None:
            m_global = m_local * jax.lax.psum(1, axis_name)
        else:
            m_global = m_local
        scale = num_total / m_global
        resp, evidence = bmm.e_step(batch, exp)
        stats = bmm.suff_stats(batch, resp, scale=scale)
        if axis_name is not None:
            stats = jax.lax.psum(stats, axis_name)
        inc = bmm.stats_to_nat(stats)
        rho_t = rho(state.step) if callable(rho) else rho
        new_nat = natgrad.cvi_update(state.nat, prior, inc, rho_t)
        local = scale * jnp.sum(evidence)
        if axis_name is not None:
            local = jax.lax.psum(local, axis_name)
        metrics = {
            "local_evidence": local,
            "elbo": local - bmm.kl_global(state.nat, prior),
            "rho": jnp.asarray(rho_t),
        }
        return BmmTrainState(nat=new_nat, step=state.step + 1), metrics

    return step


@partial(jax.jit, static_argnames=("num_total",))
def evaluate(nat: BmmNat, prior: BmmNat, x: jnp.ndarray, num_total: int):
    """Held-out per-point evidence, exact predictive log-mass, and ELBO."""
    exp = bmm.expected_params(nat)
    _, evidence = bmm.e_step(x, exp)
    scale = num_total / x.shape[0]
    return {
        "evidence_per_point": jnp.mean(evidence),
        "predictive_log_mass_per_point": jnp.mean(
            bmm.predictive_log_prob(nat, x)
        ),
        "elbo": scale * jnp.sum(evidence) - bmm.kl_global(nat, prior),
    }
