"""Pure Student-t mixture baseline trained by natural-gradient VMP.

Mirror of ``gmm_baseline`` for the heavy-tailed SMM variant (svax.pgm.smm):
one jitted step = scale-augmented E-step → u-weighted statistics →
(optional psum) → CVI update. The dof parameter is the Student-t degrees of
freedom (u ~ Gamma(dof/2, dof/2)).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from svax.pgm import gmm, natgrad, smm
from svax.pgm.gmm import GmmNat


class SmmTrainState(NamedTuple):
    nat: GmmNat
    step: jnp.ndarray


def init_state(key: jax.Array, prior: GmmNat, data=None, pseudo_counts: float = 2.0) -> SmmTrainState:
    nat = gmm.init_variational(key, prior, data, pseudo_counts=pseudo_counts)
    return SmmTrainState(nat=nat, step=jnp.zeros((), jnp.int32))


def make_train_step(
    prior: GmmNat,
    rho: float | Callable,
    num_total: int,
    dof: float = 4.0,
    axis_name: str | None = None,
) -> Callable:
    def step(state: SmmTrainState, batch: jnp.ndarray):
        exp = gmm.expected_params(state.nat)
        resp, e_u, evidence = smm.e_step_obs(batch, exp, dof)
        m_local = batch.shape[0]
        if axis_name is not None:
            m_global = m_local * jax.lax.psum(1, axis_name)
        else:
            m_global = m_local
        scale = num_total / m_global
        stats = smm.suff_stats_obs(batch, resp, e_u, scale=scale)
        if axis_name is not None:
            stats = jax.lax.psum(stats, axis_name)
        inc = smm.stats_to_nat(stats)
        rho_t = rho(state.step) if callable(rho) else rho
        new_nat = natgrad.cvi_update(state.nat, prior, inc, rho_t)
        local = scale * jnp.sum(evidence)
        if axis_name is not None:
            local = jax.lax.psum(local, axis_name)
        # Same-naturals convention as gmm_baseline: the bound at state.nat.
        metrics = {
            "local_evidence": local,
            "elbo": local - gmm.kl_global(state.nat, prior),
            "rho": jnp.asarray(rho_t),
        }
        return SmmTrainState(nat=new_nat, step=state.step + 1), metrics

    return step
