"""Component (K) sharding — expert-parallel analog for large-K configs.

Verifies on a 2×4 virtual mesh that the comp-sharded path reproduces the
single-device computation exactly on every deterministic quantity:
expected params, global softmax, global KL, and the CVI update of the
K-shards after one SVAE step (sufficient statistics are closed-form
moments, independent of the Monte-Carlo noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from svax.data import make_pinwheel_data
from svax.models.svae import SvaeConfig
from svax.parallel import mesh as pmesh
from svax.pgm import gmm
from svax.train import svae_step


def _nat(key, k, d, x=None):
    prior = gmm.make_prior(k, d, dtype=jnp.float64)
    return prior, gmm.init_variational(key, prior, x)


def test_sharded_expected_params_and_kl_match(key):
    k, d = 8, 2
    prior, nat = _nat(key, k, d)
    want_exp = gmm.expected_params(nat)
    want_kl = float(gmm.kl_global(nat, prior))

    mesh = pmesh.make_data_comp_mesh(2, 4)

    def body(nat_l, prior_l):
        exp_l = gmm.expected_params(nat_l, axis_comp="comp")
        kl = gmm.kl_global(nat_l, prior_l, axis_comp="comp")
        return exp_l, kl

    specs = jax.tree.map(lambda _: P("comp"), nat)
    got_exp, got_kl = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, specs),
            out_specs=(jax.tree.map(lambda _: P("comp"), want_exp), P()),
            check_vma=False,
        )
    )(nat, prior)
    np.testing.assert_allclose(float(got_kl), want_kl, rtol=1e-12)
    for a, b in zip(got_exp, want_exp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_lse_over_components_matches(key, rng):
    mesh = pmesh.make_data_comp_mesh(2, 4)
    log_rho = jnp.asarray(rng.standard_normal((16, 8)) * 5.0)
    want = jax.nn.logsumexp(log_rho, axis=-1)

    got = jax.jit(
        jax.shard_map(
            lambda lr: gmm.lse_over_components(lr, "comp"),
            mesh=mesh,
            in_specs=P("data", "comp"),
            out_specs=P("data"),
            check_vma=False,
        )
    )(log_rho)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_comp_sharded_svae_step_pgm_exact(key):
    """One (data×comp)-sharded SVAE step updates the PGM naturals exactly
    as the single-device step (stats are MC-noise-free closed forms)."""
    n_data, n_comp = 2, 4
    k, d = 8, 2
    x = jnp.asarray(
        make_pinwheel_data(num_classes=4, num_per_class=16, seed=0), dtype=jnp.float64
    )  # N=64
    n = x.shape[0]
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=1, num_total=n)
    prior = gmm.make_prior(k, d, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    state = svae_step.init_state(
        key, 2, config, prior, opt, (8,), (8,), data=x, dtype=jnp.float64
    )

    # Single-device reference.
    single = jax.jit(svae_step.make_train_step(config, prior, opt, rho=0.4))
    ref_state, ref_metrics = single(state, x, key)

    mesh = pmesh.make_data_comp_mesh(n_data, n_comp)
    builder = lambda prior_l: svae_step.make_train_step(  # noqa: E731
        config, prior_l, opt, rho=0.4, axis_name="data", axis_comp="comp"
    )
    dp = pmesh.data_comp_parallel_step(builder, prior, mesh)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    got_state, got_metrics = dp(state, x_sharded, key)

    for a, b in zip(jax.tree.leaves(got_state.pgm_nat), jax.tree.leaves(ref_state.pgm_nat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10)
    # Deterministic ELBO pieces match too (local/global KL are MC-free).
    np.testing.assert_allclose(
        float(got_metrics["local_kl"]), float(ref_metrics["local_kl"]), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(got_metrics["global_kl"]), float(ref_metrics["global_kl"]), rtol=1e-9
    )
    # Grads/recon depend on per-shard noise; just require sane updates.
    for a in jax.tree.leaves(got_state.nn_params):
        assert np.isfinite(np.asarray(a)).all()


def test_trainer_component_shards():
    """SvaeTrainer drives the 2-D (data×comp) mesh end-to-end."""
    from svax.train.trainer import SvaeTrainer, TrainerConfig

    x_np = make_pinwheel_data(num_classes=4, num_per_class=16, seed=1)
    x = jnp.asarray(x_np, dtype=jnp.float64)
    mc = SvaeConfig(latent_dim=2, num_components=8, num_samples=1, num_total=x.shape[0])
    tc = TrainerConfig(
        steps=10, eval_every=5, rho=0.3, encoder_hidden=(8,), decoder_hidden=(8,),
        data_parallel=True, component_shards=4,
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    state = trainer.fit(x)
    assert int(state.step) == 10
    assert np.isfinite(float(state.pgm_nat.dir_nat.sum()))


def test_comp_sharded_smm_svae_step_pgm_exact(key):
    """The SMM-prior SVAE's comp-sharded step matches single-device exactly
    on the PGM update and the MC-free ELBO pieces (same contract as the
    GMM-prior test above; the u-z coordinate rounds are K-local)."""
    from svax.models import svae_smm

    n_data, n_comp = 2, 4
    k, d = 8, 2
    x = jnp.asarray(
        make_pinwheel_data(num_classes=4, num_per_class=16, seed=2), dtype=jnp.float64
    )
    n = x.shape[0]
    config = SvaeConfig(
        latent_dim=d, num_components=k, num_samples=1, num_total=n, dof=4.0
    )
    prior = gmm.make_prior(k, d, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    state = svae_step.init_state(
        key, 2, config, prior, opt, (8,), (8,), data=x, dtype=jnp.float64
    )

    single = jax.jit(
        svae_step.make_train_step(config, prior, opt, rho=0.4, model=svae_smm)
    )
    ref_state, ref_metrics = single(state, x, key)

    mesh = pmesh.make_data_comp_mesh(n_data, n_comp)
    builder = lambda prior_l: svae_step.make_train_step(  # noqa: E731
        config, prior_l, opt, rho=0.4, axis_name="data", axis_comp="comp",
        model=svae_smm,
    )
    dp = pmesh.data_comp_parallel_step(builder, prior, mesh)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    got_state, got_metrics = dp(state, x_sharded, key)

    for a, b in zip(
        jax.tree.leaves(got_state.pgm_nat), jax.tree.leaves(ref_state.pgm_nat)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        float(got_metrics["local_kl"]), float(ref_metrics["local_kl"]), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(got_metrics["global_kl"]), float(ref_metrics["global_kl"]), rtol=1e-9
    )
