"""Data-parallel correctness on an 8-device virtual CPU mesh (SURVEY.md §5).

The TPU-native replacement for multi-node tests: the same shard_map/psum
program that runs over ICI on a pod runs here against
--xla_force_host_platform_device_count=8 (set in conftest.py).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import make_pinwheel_data
from svax.models import gmm_baseline
from svax.models.svae import SvaeConfig
from svax.parallel import mesh as pmesh
from svax.pgm import gmm
from svax.train import svae_step


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_psum_suff_stats_equal_full_batch(rng):
    """psum'd per-shard GMM stats == single-device full-batch stats."""
    x = jnp.asarray(make_pinwheel_data(num_classes=5, num_per_class=80, seed=0))
    k = 6
    prior = gmm.make_prior(k, 2, dtype=jnp.float64)
    nat = gmm.init_variational(jax.random.PRNGKey(0), prior, x)
    exp = gmm.expected_params(nat)
    resp, _ = gmm.e_step_obs(x, exp)
    want = gmm.suff_stats_obs(x, resp, scale=1.0)

    m = pmesh.make_data_mesh()
    from jax.sharding import PartitionSpec as P

    def shard_stats(xs):
        exp_l = gmm.expected_params(nat)
        r, _ = gmm.e_step_obs(xs, exp_l)
        stats = gmm.suff_stats_obs(xs, r, scale=1.0)
        return jax.lax.psum(stats, "data")

    got = jax.jit(
        jax.shard_map(shard_stats, mesh=m, in_specs=P("data"), out_specs=P(), check_vma=False)
    )(x)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-9)


@pytest.mark.slow
def test_gmm_trajectory_mesh_invariant():
    """Full GMM CVI trajectory identical on 1 device vs 8-device mesh."""
    x = jnp.asarray(make_pinwheel_data(num_classes=5, num_per_class=48, seed=1))
    k = 5
    prior = gmm.make_prior(k, 2, dtype=jnp.float64)
    state0 = gmm_baseline.init_state(jax.random.PRNGKey(1), prior, x)

    single = jax.jit(gmm_baseline.make_train_step(prior, 0.7, num_total=x.shape[0]))
    state_s = state0
    for _ in range(10):
        state_s, metrics_s = single(state_s, x)

    m = pmesh.make_data_mesh()
    dp = pmesh.data_parallel_gmm_step(
        gmm_baseline.make_train_step(prior, 0.7, num_total=x.shape[0], axis_name="data"),
        m,
    )
    state_d = state0
    for _ in range(10):
        state_d, metrics_d = dp(state_d, x)

    for a, b in zip(jax.tree.leaves(state_s.nat), jax.tree.leaves(state_d.nat)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        float(metrics_d["elbo"]), float(metrics_s["elbo"]), rtol=1e-10
    )


@pytest.mark.slow
def test_svae_dp_matches_manual_shard_simulation(key):
    """One SVAE DP step == sequential simulation of the 8 shards + psum.

    Validates psum bookkeeping (grads, stats, KL splitting) exactly, without
    requiring Monte-Carlo draws to be mesh-layout invariant: the simulation
    uses the same per-shard folded keys shard_map uses.
    """
    n_dev = 8
    x = jnp.asarray(
        make_pinwheel_data(num_classes=4, num_per_class=32, seed=2), dtype=jnp.float64
    )  # N=128 → 16 per device
    n = x.shape[0]
    config = SvaeConfig(latent_dim=2, num_components=4, num_samples=2, num_total=n)
    prior = gmm.make_prior(4, 2, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    state0 = svae_step.init_state(
        key, 2, config, prior, opt, (16,), (16,), data=x, dtype=jnp.float64
    )

    # --- shard_map path
    m = pmesh.make_data_mesh()
    inner = svae_step.make_train_step(config, prior, opt, rho=0.3, axis_name="data")
    dp = pmesh.data_parallel_step(inner, m)
    state_dp, metrics_dp = dp(state0, x, key)

    # --- manual simulation: same folded keys, hand-psum
    import jax.numpy as jnp2
    from svax.models import svae as svae_mod
    from svax.pgm import natgrad

    shards = x.reshape(n_dev, n // n_dev, 2)
    # First-principles local objective: forward over the shard with the TRUE
    # global scale N/M_global = 1 (num_total = shard size does that), global
    # KL counted once across the mesh.
    config_sim = config._replace(num_total=n // n_dev)

    def local_loss(nn_params, pgm_nat, xs, k):
        out = svae_mod.forward(nn_params, pgm_nat, prior, xs, k, config_sim)
        elbo_local = out.recon - out.local_kl - out.global_kl / n_dev
        return -elbo_local / config.num_total, out

    grads_sum = None
    stats_sum = None
    for idx in range(n_dev):
        k_i = jax.random.fold_in(key, idx)
        (_, out), g = jax.value_and_grad(local_loss, has_aux=True)(
            state0.nn_params, state0.pgm_nat, shards[idx], k_i
        )
        grads_sum = g if grads_sum is None else jax.tree.map(jnp2.add, grads_sum, g)
        stats_sum = (
            out.suff_stats
            if stats_sum is None
            else jax.tree.map(jnp2.add, stats_sum, out.suff_stats)
        )

    updates, _ = opt.update(grads_sum, state0.opt_state, state0.nn_params)
    nn_want = optax.apply_updates(state0.nn_params, updates)
    pgm_want = natgrad.cvi_update(
        state0.pgm_nat, prior, gmm.stats_to_nat(stats_sum), 0.3
    )

    for a, b in zip(jax.tree.leaves(state_dp.nn_params), jax.tree.leaves(nn_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)
    for a, b in zip(jax.tree.leaves(state_dp.pgm_nat), jax.tree.leaves(pgm_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)
