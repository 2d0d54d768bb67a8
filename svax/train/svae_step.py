"""Single jitted SVAE train step: Adam on NN params + CVI on PGM naturals.

SURVEY.md §4.1: one step = reparameterized-ELBO gradient step on the
encoder/decoder (any optax optimizer) and one natural-gradient CVI step on
the Dirichlet/NIW naturals, both inside ONE jitted function — no host
round-trips (§8 hard part #5). With ``axis_name`` set, the step runs inside
``shard_map`` over a data mesh: NN grads and CVI sufficient statistics are
psum'd over ICI (SURVEY.md §3b), and the global-KL term is split across
devices so the psum'd gradient equals the single-device full-batch gradient.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from svax.models import svae
from svax.models.svae import SvaeConfig
from svax.pgm import natgrad
from svax.pgm.gmm import GmmNat


class SvaeTrainState(NamedTuple):
    nn_params: dict
    opt_state: optax.OptState
    pgm_nat: GmmNat
    step: jnp.ndarray


def init_state(
    key: jax.Array,
    input_dim: int,
    config: SvaeConfig,
    prior: GmmNat,
    optimizer: optax.GradientTransformation,
    encoder_hidden=(50, 50),
    decoder_hidden=(50, 50),
    init_pseudo_counts: float = 2.0,
    data: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> SvaeTrainState:
    from svax.pgm import gmm

    k_nn, k_pgm = jax.random.split(key)
    nn_params = svae.init_params(
        k_nn, input_dim, config, encoder_hidden, decoder_hidden, dtype=dtype
    )
    # Component locations live in LATENT space; observed data can seed them
    # only when the dimensions coincide (e.g. 2-D pinwheel).
    if data is not None and data.shape[-1] != config.latent_dim:
        data = None
    pgm_nat = gmm.init_variational(k_pgm, prior, data, pseudo_counts=init_pseudo_counts)
    return SvaeTrainState(
        nn_params=nn_params,
        opt_state=optimizer.init(nn_params),
        pgm_nat=pgm_nat,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    config: SvaeConfig,
    prior: GmmNat,
    optimizer: optax.GradientTransformation,
    rho: float | Callable,
    axis_name: str | None = None,
    axis_comp: str | None = None,
    model=svae,
) -> Callable:
    """Build the jittable combined step(state, batch, key) → (state, metrics).

    ``axis_name`` shards the batch (data parallelism: psum of grads and
    sufficient statistics); ``axis_comp`` shards the mixture components
    (component/expert parallelism for large K: the PGM naturals and their
    CVI updates are K-local, NN grads additionally psum over the component
    axis since each shard sees only its components' reconstruction terms).
    The two compose over a 2-D mesh.

    ``model`` is the SVAE-variant module: it must expose
    ``forward(nn, nat, prior, x, key, config, axis_comp=...) → SvaeOutputs``
    and (optionally) ``stats_to_nat`` mapping its sufficient-statistic
    pytree to natural increments — defaults cover the GMM-prior SVAE;
    ``svax.models.svae_smm`` plugs in the Student-t-prior variant.
    """
    from svax.pgm import gmm as gmm_mod

    stats_to_nat = getattr(model, "stats_to_nat", gmm_mod.stats_to_nat)

    def loss_fn(nn_params, pgm_nat, batch, key):
        out = model.forward(
            nn_params, pgm_nat, prior, batch, key, config, axis_comp=axis_comp
        )
        if axis_name is not None:
            # forward() scaled local sums by N/M_local = ndev · N/M_global;
            # dividing everything by ndev makes the psum over devices equal
            # the single-device full-batch quantities exactly (tested).
            ndev = jax.lax.psum(1, axis_name)
            elbo_local = (out.recon - out.local_kl - out.global_kl) / ndev
        else:
            elbo_local = out.elbo
        # Per-datapoint scaling keeps Adam step sizes dataset-size invariant.
        return -elbo_local / config.num_total, out

    grad_axes = tuple(a for a in (axis_name, axis_comp) if a is not None)

    def step(state: SvaeTrainState, batch: jnp.ndarray, key: jax.Array):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.nn_params, state.pgm_nat, batch, key
        )
        stats = out.suff_stats
        if grad_axes:
            # Each shard's NN grad is its local contribution (the psum
            # transpose broadcasts cotangents); the replicated optimizer
            # needs the sum over every sharded axis.
            grads = jax.lax.psum(grads, grad_axes)
        if axis_comp is not None:
            # forward() psums recon/local over the comp axis INSIDE the
            # loss, so every shard's loss is already the comp-global value
            # and transpose(psum)=psum makes Σ_shards ∇loss = ndev_comp·∇F
            # (measured exactly 4× on a 4-shard mesh; Adam's scale
            # invariance masked it). Normalize back to the true gradient.
            grads = jax.tree.map(
                lambda g: g / jax.lax.psum(1, axis_comp), grads
            )
        if axis_name is not None:
            ndev = jax.lax.psum(1, axis_name)
            loss = jax.lax.psum(loss, axis_name)
            stats = jax.lax.psum(
                jax.tree.map(lambda s: s / ndev, stats), axis_name
            )

        updates, opt_state = optimizer.update(grads, state.opt_state, state.nn_params)
        nn_params = optax.apply_updates(state.nn_params, updates)

        inc = stats_to_nat(stats)
        rho_t = rho(state.step) if callable(rho) else rho
        pgm_nat = natgrad.cvi_update(state.pgm_nat, prior, inc, rho_t)

        recon, local = out.recon, out.local_kl
        if axis_name is not None:
            recon = jax.lax.psum(recon / ndev, axis_name)
            local = jax.lax.psum(local / ndev, axis_name)
        metrics = {
            "elbo": -loss * config.num_total,
            "recon": recon,
            "local_kl": local,
            "global_kl": out.global_kl,
            "rho": jnp.asarray(rho_t),
        }
        new_state = SvaeTrainState(
            nn_params=nn_params,
            opt_state=opt_state,
            pgm_nat=pgm_nat,
            step=state.step + 1,
        )
        return new_state, metrics

    return step


def make_eval_fn(config: SvaeConfig, prior: GmmNat, model=svae) -> Callable:
    """Held-out ELBO decomposition at fixed parameters (SURVEY.md §4.4)."""

    def evaluate(state: SvaeTrainState, x: jnp.ndarray, key: jax.Array):
        cfg = config._replace(num_total=x.shape[0])
        out = model.forward(state.nn_params, state.pgm_nat, prior, x, key, cfg)
        n = x.shape[0]
        return {
            "elbo_per_point": out.elbo / n,
            "recon_per_point": out.recon / n,
            "local_kl_per_point": out.local_kl / n,
            "global_kl": out.global_kl,
        }

    return evaluate
