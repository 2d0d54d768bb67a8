"""Whole-train-step megakernel vs the XLA train step at matched noise.

Runs the tinystep kernel body through the Pallas interpreter on CPU with
INJECTED eps and compares every piece of updated state — NN params, Adam
moments, PGM naturals — plus the per-step metrics against an explicit
mirror of ``svae_step.make_train_step`` (Adam via optax, CVI via
natgrad.cvi_update, forward via svae.forward at the same eps).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import make_pinwheel_data
from svax.models import svae, svae_smm
from svax.models.svae import SvaeConfig
from svax.ops import tinystep_pallas as tsp
from svax.pgm import gmm, natgrad
from svax.train import svae_step

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _setup(n=72, k=4, s=2, hidden=(16, 16), lr=3e-3, seed=0, dof=0.0,
           smm_iters=2, smm_env=False):
    x64 = jnp.asarray(make_pinwheel_data(num_classes=3, num_per_class=n // 3,
                                         seed=seed)[:n])
    x = x64.astype(jnp.float32)
    config = SvaeConfig(latent_dim=2, num_components=k, num_samples=s,
                        num_total=n, dof=dof, smm_iters=smm_iters,
                        smm_envelope_grads=smm_env)
    prior = jax.tree.map(
        lambda a: a.astype(jnp.float32), gmm.make_prior(k, 2, kappa=0.05)
    )
    opt = optax.adam(lr)
    state = svae_step.init_state(
        jax.random.PRNGKey(seed), 2, config, prior, opt,
        encoder_hidden=hidden, decoder_hidden=hidden, data=x,
    )
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state
    )
    return x, config, prior, opt, state


def _oracle_steps(state, prior, x, eps_all, config, opt, rho, model=svae,
                  x_all=None):
    """T explicit XLA steps at the injected eps (mirrors make_train_step).

    ``x_all`` (T, N, d) optionally trains on per-step data — the
    augmentation-recipe oracle (loop.augment_step semantics at matched
    noise)."""
    stats_to_nat = getattr(model, "stats_to_nat", gmm.stats_to_nat)

    def loss_fn(nn_params, pgm_nat, xb, eps):
        out = model.forward(nn_params, pgm_nat, prior, xb,
                            jax.random.PRNGKey(0), config, eps=eps)
        return -out.elbo / config.num_total, out

    metrics = {"recon": [], "local_kl": [], "neg_loss": []}
    for t in range(eps_all.shape[0]):
        xb = x if x_all is None else x_all[t]
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.nn_params, state.pgm_nat, xb, eps_all[t]
        )
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.nn_params)
        nn_params = optax.apply_updates(state.nn_params, updates)
        inc = stats_to_nat(out.suff_stats)
        pgm_nat = natgrad.cvi_update(state.pgm_nat, prior, inc, rho)
        state = svae_step.SvaeTrainState(
            nn_params=nn_params, opt_state=opt_state, pgm_nat=pgm_nat,
            step=state.step + 1,
        )
        metrics["recon"].append(float(out.recon))
        metrics["local_kl"].append(float(out.local_kl))
        metrics["neg_loss"].append(float(loss))
    return state, metrics


def _assert_tree_close(a, b, rtol, atol, what):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(la, np.float64), np.asarray(lb, np.float64),
            rtol=rtol, atol=atol, err_msg=what,
        )


def _run_and_compare(t_steps, n=72, k=4, s=2, hidden=(16, 16), rho=0.2,
                     lr=3e-3, seed=0, dof=0.0, smm_iters=2, smm_env=False,
                     aug=0.0):
    x, config, prior, opt, state = _setup(n, k, s, hidden, lr, seed, dof,
                                          smm_iters, smm_env)
    rng = np.random.default_rng(seed + 100)
    eps_all = jnp.asarray(
        rng.standard_normal((t_steps, s, n, k, 2)).astype(np.float32)
    )
    aug_eps = x_all = None
    if aug > 0.0:
        aug_eps = jnp.asarray(
            rng.standard_normal((t_steps, n, 2)).astype(np.float32)
        )
        x_all = x[None] + aug * aug_eps

    st_k, mets_k = tsp.train_chunk(
        state, prior, x, lr=lr, rho=rho, t_steps=t_steps, eps=eps_all,
        interpret=True, dof=dof, smm_iters=smm_iters,
        smm_envelope_grads=smm_env, aug_noise=aug, aug_eps=aug_eps,
    )
    model = svae if dof == 0.0 else svae_smm
    st_o, mets_o = _oracle_steps(state, prior, x, eps_all, config, opt, rho,
                                 model=model, x_all=x_all)

    _assert_tree_close(st_k.nn_params, st_o.nn_params, 5e-4, 5e-5,
                       "nn params")
    adam_k, adam_o = st_k.opt_state[0], st_o.opt_state[0]
    assert int(adam_k.count) == int(adam_o.count)
    _assert_tree_close(adam_k.mu, adam_o.mu, 5e-4, 5e-6, "adam mu")
    _assert_tree_close(adam_k.nu, adam_o.nu, 5e-4, 1e-8, "adam nu")
    _assert_tree_close(st_k.pgm_nat, st_o.pgm_nat, 2e-5, 2e-5, "naturals")
    np.testing.assert_allclose(np.asarray(mets_k["recon"]),
                               np.asarray(mets_o["recon"]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(mets_k["local_kl"]),
                               np.asarray(mets_o["local_kl"]),
                               rtol=2e-4, atol=2e-4)
    assert int(st_k.step) == int(st_o.step)


def test_single_step_matches_oracle():
    _run_and_compare(t_steps=1)


def test_trajectory_matches_oracle():
    """3 chained in-kernel steps == 3 XLA steps: Adam moments, CVI
    naturals, and metrics all track across the VMEM-resident carry."""
    _run_and_compare(t_steps=3)


def test_odd_shapes():
    """K not a sublane multiple, N not a lane multiple, S=1, bigger MLPs."""
    _run_and_compare(t_steps=2, n=150, k=5, s=1, hidden=(20, 12), rho=0.5,
                     seed=3)


def test_smm_prior_matches_oracle():
    """dof > 0: the kernel's u–z coordinate rounds + Gamma free-energy
    terms track svae_smm.forward exactly (full-chain gradients)."""
    _run_and_compare(t_steps=2, dof=4.0, smm_iters=2)


def test_smm_envelope_grads_matches_oracle():
    """Envelope-theorem gradients: the in-kernel stop_gradient on q(u)
    mirrors config.smm_envelope_grads in the XLA oracle."""
    _run_and_compare(t_steps=2, dof=4.0, smm_iters=2, smm_env=True)


def test_smm_odd_shapes():
    """SMM prior at padded K/N, S=1, one u-round, heavier tails."""
    _run_and_compare(t_steps=2, n=150, k=5, s=1, hidden=(20, 12), rho=0.5,
                     seed=3, dof=2.5, smm_iters=1)


def test_aug_noise_matches_oracle():
    """In-kernel input-noise augmentation == augment_step semantics at
    matched ξ: the kernel trains on x + σ·ξ each step (recon targets AND
    encoder inputs both perturbed), mirroring the seed-robustness recipe."""
    _run_and_compare(t_steps=2, aug=0.4)


def test_aug_noise_odd_shapes():
    """Augmentation at padded K/N (masking of the perturbed plane)."""
    _run_and_compare(t_steps=2, n=150, k=5, s=1, hidden=(20, 12), rho=0.5,
                     seed=3, aug=0.25)


def test_runner_routes_aug_to_tinystep():
    """make_megakernel_runner: aug>0 full-batch d=2 runs the tinystep
    kernel in-kernel-augmentation path (flexstep only under force_flex)."""
    from svax.train.loop import make_megakernel_runner

    x, config, prior, opt, state = _setup(n=72, k=4, s=2)
    runner = make_megakernel_runner(
        config, prior, lr=3e-3, rho=0.2, batch_size=0, aug_noise=0.4,
        encoder_hidden=(16, 16), decoder_hidden=(16, 16), interpret=True)
    st, mets = runner(state, x, 2, seed=0)
    assert int(st.step) == 2
    assert np.isfinite(np.asarray(mets["elbo"])).all()
    # tinystep trains on the FULL batch each step: its stats keep the
    # full-N scale (flexstep at batch 72 would too here, so instead pin
    # the route by checking force_flex produces a different eps stream →
    # different naturals at the same seed).
    runner_f = make_megakernel_runner(
        config, prior, lr=3e-3, rho=0.2, batch_size=0, aug_noise=0.4,
        encoder_hidden=(16, 16), decoder_hidden=(16, 16), interpret=True,
        force_flex=True)
    st_f, _ = runner_f(state, x, 2, seed=0)
    assert not np.allclose(np.asarray(st.pgm_nat.dir_nat),
                           np.asarray(st_f.pgm_nat.dir_nat))


def test_supported_gate():
    config = SvaeConfig(latent_dim=2, num_components=10, num_samples=4,
                        num_total=400)
    ok = tsp.supported(config, batch_full=True, encoder_hidden=(50, 50),
                       decoder_hidden=(50, 50), rho=0.05)
    assert ok
    assert not tsp.supported(
        config._replace(likelihood="bernoulli"), batch_full=True,
        encoder_hidden=(50, 50), decoder_hidden=(50, 50), rho=0.05,
    )
    assert not tsp.supported(config, batch_full=False,
                             encoder_hidden=(50, 50),
                             decoder_hidden=(50, 50), rho=0.05)
