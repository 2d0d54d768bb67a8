"""Flexstep megakernel vs the XLA train step at matched noise + batches.

Runs the generalized whole-train-step kernel (svax/ops/flexstep_pallas.py)
through the Pallas interpreter on CPU with INJECTED eps and a fixed
minibatch stack, and compares every piece of updated state — NN params,
Adam moments, PGM naturals — plus the per-step metrics against an
explicit mirror of ``svae_step.make_train_step`` at the same batches/eps
(the tinystep oracle pattern, generalized to d_lat=4, d_in>2, minibatch,
rho decay).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.models import svae
from svax.models.svae import SvaeConfig
from svax.ops import flexstep_pallas as fsp
from svax.pgm import gmm, natgrad
from svax.train import svae_step

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _setup(n=96, m=24, d_in=5, d_lat=3, k=4, s=2, hidden=(16, 16),
           lr=3e-3, seed=0):
    kx, kinit = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (n, d_in), jnp.float32)
    config = SvaeConfig(latent_dim=d_lat, num_components=k, num_samples=s,
                        num_total=n)
    prior = jax.tree.map(
        lambda a: a.astype(jnp.float32), gmm.make_prior(k, d_lat, kappa=0.05)
    )
    opt = optax.adam(lr)
    state = svae_step.init_state(
        kinit, d_in, config, prior, opt,
        encoder_hidden=hidden, decoder_hidden=hidden, data=x,
    )
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state
    )
    return x, config, prior, opt, state, m


def _oracle_steps(state, prior, batches, eps_all, config, opt, rho0,
                  rho_decay):
    """T explicit XLA steps at the injected eps (mirrors make_train_step)."""

    def loss_fn(nn_params, pgm_nat, xb, eps):
        out = svae.forward(nn_params, pgm_nat, prior, xb,
                           jax.random.PRNGKey(0), config, eps=eps)
        return -(out.recon - out.local_kl) / config.num_total, out

    metrics = {"recon": [], "local_kl": [], "neg_loss": [], "rho": []}
    for t in range(eps_all.shape[0]):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.nn_params, state.pgm_nat, batches[t], eps_all[t]
        )
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.nn_params)
        nn_params = optax.apply_updates(state.nn_params, updates)
        inc = gmm.stats_to_nat(out.suff_stats)
        rho_t = rho0 / (1.0 + rho_decay * float(state.step))
        pgm_nat = natgrad.cvi_update(state.pgm_nat, prior, inc, rho_t)
        state = svae_step.SvaeTrainState(
            nn_params=nn_params, opt_state=opt_state, pgm_nat=pgm_nat,
            step=state.step + 1,
        )
        metrics["recon"].append(float(out.recon))
        metrics["local_kl"].append(float(out.local_kl))
        metrics["neg_loss"].append(float(loss))
        metrics["rho"].append(rho_t)
    return state, metrics


def _assert_tree_close(a, b, rtol, atol, what):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(la, np.float64), np.asarray(lb, np.float64),
            rtol=rtol, atol=atol, err_msg=what,
        )


def _run_and_compare(t_steps, rho0=0.2, rho_decay=0.0, seed=0, **shape):
    x, config, prior, opt, state, m = _setup(seed=seed, **shape)
    n, d_in = x.shape
    rng = np.random.default_rng(seed + 1)
    idx = rng.integers(0, n, size=(t_steps, m))
    batches = x[jnp.asarray(idx)]
    eps = jnp.asarray(rng.standard_normal(
        (t_steps, config.num_samples, m, config.num_components,
         config.latent_dim)).astype(np.float32))

    st_k, mets_k = fsp.train_chunk(
        state, prior, batches, lr=3e-3, rho=rho0, rho_decay=rho_decay,
        num_total=n, eps=eps, interpret=True,
    )
    st_o, mets_o = _oracle_steps(state, prior, batches, eps, config, opt,
                                 rho0, rho_decay)

    _assert_tree_close(st_k.nn_params, st_o.nn_params, 5e-4, 5e-5,
                       "nn params")
    _assert_tree_close(st_k.opt_state[0].mu, st_o.opt_state[0].mu,
                       5e-4, 1e-5, "adam mu")
    _assert_tree_close(st_k.pgm_nat, st_o.pgm_nat, 5e-4, 5e-4, "naturals")
    assert int(st_k.step) == int(st_o.step) == t_steps
    for key_, tol in (("recon", 2e-3), ("local_kl", 2e-3),
                      ("neg_loss", 1e-4), ("rho", 1e-6)):
        np.testing.assert_allclose(
            np.asarray(mets_k[key_]), np.asarray(mets_o[key_]),
            rtol=tol, atol=tol, err_msg=key_,
        )


def test_single_step_matches_oracle():
    _run_and_compare(1)


def test_trajectory_matches_oracle():
    _run_and_compare(4)


def test_auto_shape_class():
    # The BASELINE config-#3 shape class (scaled down): d_in=8, d_lat=4,
    # rho decay active, K not a multiple of 8.
    _run_and_compare(3, rho0=0.2, rho_decay=0.001, seed=3,
                     n=80, m=32, d_in=8, d_lat=4, k=5, s=2)


def test_full_batch_rows():
    # Full batch = every stack row the same batch.
    x, config, prior, opt, state, _ = _setup(n=64, m=64, seed=5)
    t = 2
    rng = np.random.default_rng(9)
    batches = jnp.broadcast_to(x, (t,) + x.shape)
    eps = jnp.asarray(rng.standard_normal(
        (t, config.num_samples, 64, config.num_components,
         config.latent_dim)).astype(np.float32))
    st_k, _ = fsp.train_chunk(state, prior, batches, lr=3e-3, rho=0.3,
                              num_total=64, eps=eps, interpret=True)
    st_o, _ = _oracle_steps(state, prior, batches, eps, config, opt,
                            0.3, 0.0)
    _assert_tree_close(st_k.pgm_nat, st_o.pgm_nat, 5e-4, 5e-4, "naturals")


def test_supported_gate():
    config = SvaeConfig(latent_dim=4, num_components=10, num_samples=4,
                        num_total=100)
    ok = dict(d_in=8, encoder_hidden=(100, 100), decoder_hidden=(100, 100))
    assert fsp.supported(config, **ok)
    assert not fsp.supported(config._replace(latent_dim=7), **ok)
    assert not fsp.supported(config._replace(likelihood="bernoulli"), **ok)
    assert not fsp.supported(config, d_in=9,
                             encoder_hidden=(100, 100),
                             decoder_hidden=(100, 100))
    assert not fsp.supported(config, d_in=8, encoder_hidden=(100,),
                             decoder_hidden=(100, 100))
