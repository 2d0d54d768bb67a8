"""Pure-GMM baseline trained by natural-gradient VMP (BASELINE config #2).

The reference trains a plain Bayesian GMM directly on the data with the same
CVI machinery the SVAE uses for its latent prior (SURVEY.md §3a "Pure-GMM
baseline", §4.2 call stack). One jitted step = E-step → scaled sufficient
statistics → (optional psum across a data mesh) → CVI update.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from svax.pgm import gmm, natgrad
from svax.pgm.gmm import GmmNat


class GmmTrainState(NamedTuple):
    nat: GmmNat
    step: jnp.ndarray


def init_state(key: jax.Array, prior: GmmNat, data=None, pseudo_counts: float = 2.0) -> GmmTrainState:
    nat = gmm.init_variational(key, prior, data, pseudo_counts=pseudo_counts)
    return GmmTrainState(nat=nat, step=jnp.zeros((), jnp.int32))


def make_train_step(
    prior: GmmNat,
    rho: float | Callable,
    num_total: int,
    axis_name: str | None = None,
    fused: bool = False,
) -> Callable:
    """Build the jittable GMM CVI step.

    ``num_total`` is the full dataset size N; the batch contributes stats
    scaled by N/M (§9.5). When ``axis_name`` is set the step is meant to run
    inside shard_map/pjit over a data mesh, and the sufficient statistics are
    psum'd over ICI before the update — the SURVEY.md §3b DP contract. Note
    the scale uses the *global* batch size M_global = M_local × mesh size.
    With ``fused=True`` the E-step + statistics run through the single-pass
    Pallas kernel (svax.ops.estep_pallas) instead of the einsum path.
    """

    def step(state: GmmTrainState, batch: jnp.ndarray):
        exp = gmm.expected_params(state.nat)
        m_local = batch.shape[0]
        if axis_name is not None:
            m_global = m_local * jax.lax.psum(1, axis_name)
        else:
            m_global = m_local
        scale = num_total / m_global
        if fused:
            from svax.ops import estep_pallas

            stats, evidence = estep_pallas.e_step_stats_fused(batch, exp, scale=scale)
        else:
            resp, evidence = gmm.e_step_obs(batch, exp)
            stats = gmm.suff_stats_obs(batch, resp, scale=scale)
        if axis_name is not None:
            stats = jax.lax.psum(stats, axis_name)
        inc = gmm.stats_to_nat(stats)
        rho_t = rho(state.step) if callable(rho) else rho
        new_nat = natgrad.cvi_update(state.nat, prior, inc, rho_t)
        local = scale * jnp.sum(evidence)
        if axis_name is not None:
            local = jax.lax.psum(local, axis_name)
        # Both ELBO terms are evaluated at the SAME (pre-update) naturals —
        # the bound at state.nat, i.e. the metric for the parameters the
        # step consumed (ADVICE r1: the earlier new_nat KL made it a lagged
        # hybrid that was the bound of no single parameter setting).
        metrics = {
            "local_evidence": local,
            "elbo": local - gmm.kl_global(state.nat, prior),
            "rho": jnp.asarray(rho_t),
        }
        return GmmTrainState(nat=new_nat, step=state.step + 1), metrics

    return step


@partial(jax.jit, static_argnames=("num_total",))
def evaluate(nat: GmmNat, prior: GmmNat, x: jnp.ndarray, num_total: int):
    """Held-out per-point evidence and full ELBO at fixed naturals."""
    exp = gmm.expected_params(nat)
    _, evidence = gmm.e_step_obs(x, exp)
    elbo, parts = gmm.elbo_obs(x, nat, prior, scale=num_total / x.shape[0])
    return {
        "evidence_per_point": jnp.mean(evidence),
        "elbo": elbo,
        **parts,
    }
