"""Fused SIN-combine Pallas kernel vs the sin_combine oracle.

Runs the ACTUAL kernel bodies (forward and the recompute backward) through
the Pallas interpreter on CPU — values AND gradients against the
independent svae.sin_combine / local_kl_term / suff_stats path, including
padding edges (N not a tile multiple, K not a sublane multiple).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svax.models import svae
from svax.ops import batched_linalg as bl
from svax.ops import combine_pallas as cp
from svax.pgm import gmm

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _inputs(n, k, d, s, seed=0):
    rng = np.random.default_rng(seed)
    pot_h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    pot_p = jnp.asarray((0.3 + rng.random((n, d))).astype(np.float32))
    prior = gmm.make_prior(k, d)
    nat = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        gmm.init_variational(jax.random.PRNGKey(seed), prior),
    )
    exp = gmm.expected_params(nat)
    eps = jnp.asarray(rng.standard_normal((s, n, k, d)).astype(np.float32))
    return pot_h, pot_p, exp, eps


def _oracle(pot_h, pot_p, exp, eps, scale=1.0):
    post = svae.sin_combine(pot_h, pot_p, exp)
    resp = jnp.exp(post.log_resp)
    s = eps.shape[0]
    z = post.mean[None] + bl.solve_triu_vec(
        jnp.broadcast_to(post.prec_chol, (s,) + post.prec_chol.shape), eps
    )
    local = svae.local_kl_term(post, exp)
    ezz = post.cov + post.mean[..., :, None] * post.mean[..., None, :]
    stats = gmm.suff_stats_from_moments(resp, post.mean, ezz, scale=scale)
    return z, post.log_resp, local, stats


@pytest.mark.parametrize(
    "n,k,d,s",
    [
        (40, 5, 2, 2),
        (130, 10, 3, 1),
        (64, 7, 4, 3),
        # Past the 128-lane packed-W boundary (d²+d+3 > 128 → 256-lane
        # block): d=11 and 12 exercise the second lane register. Measured
        # a WIN on v5e at d=12 (2.37 vs 3.81 ms fwd, K=100, N=1024).
        (48, 5, 11, 2),
        (32, 4, 12, 1),
    ],
)
def test_fused_combine_matches_oracle(n, k, d, s):
    pot_h, pot_p, exp, eps = _inputs(n, k, d, s)
    z_o, lr_o, local_o, st_o = _oracle(pot_h, pot_p, exp, eps, scale=2.5)
    z_f, lr_f, mean_f, local_f, st_f = cp.combine_fused(
        pot_h, pot_p, exp, eps, s, scale=2.5, tile=128, interpret=True
    )
    post = svae.sin_combine(pot_h, pot_p, exp)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(post.mean),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lr_f), np.asarray(lr_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(local_f), np.asarray(local_o),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_o)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def _scalar_through(fused: bool, pot_h, pot_p, exp, eps, s):
    """A scalar functional touching every output (mimics the ELBO use)."""
    if fused:
        z, lr, mean, local, st = cp.combine_fused(
            pot_h, pot_p, exp, eps, s, tile=128, interpret=True
        )
    else:
        z, lr, local, st = _oracle(pot_h, pot_p, exp, eps)
    resp = jnp.exp(lr)
    recon_proxy = jnp.sum(resp * jnp.sum(jnp.tanh(z), axis=(0, -1)))
    return recon_proxy - jnp.sum(local) + 0.01 * jnp.sum(st.scatter_stat)


@pytest.mark.parametrize("wrt", ["pot", "exp"])
@pytest.mark.parametrize("d", [3, 11])  # 11: 256-lane packed-W block
def test_fused_combine_gradients_match(wrt, d):
    n, k, s = 48, 5, 2
    pot_h, pot_p, exp, eps = _inputs(n, k, d, s, seed=3)

    if wrt == "pot":
        def f(fused):
            return jax.grad(
                lambda ph, pp: _scalar_through(fused, ph, pp, exp, eps, s),
                argnums=(0, 1),
            )(pot_h, pot_p)
    else:
        def f(fused):
            return jax.grad(
                lambda e: _scalar_through(fused, pot_h, pot_p, e, eps, s)
            )(exp)

    g_f, g_o = f(True), f(False)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_o)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_combine_forward_jits_and_composes():
    n, k, d, s = 32, 4, 2, 1
    pot_h, pot_p, exp, eps = _inputs(n, k, d, s, seed=7)
    fn = jax.jit(functools.partial(
        cp.combine_fused, num_samples=s, tile=128, interpret=True))
    z, lr, mean, local, st = fn(pot_h, pot_p, exp, eps)
    assert bool(jnp.all(jnp.isfinite(z)))
    np.testing.assert_allclose(np.asarray(jnp.exp(lr)).sum(-1), 1.0,
                               rtol=1e-5)


def test_forward_integration_fused_combine(monkeypatch):
    """svae.forward(fused_combine=True) == the XLA path at matched noise,
    with the real kernel bodies executing (interpret hook)."""
    from svax.models.svae import SvaeConfig

    monkeypatch.setattr(svae, "_COMBINE_INTERPRET", True)
    n, k, d, s, d_in = 40, 5, 2, 2, 2
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((n, d_in)).astype(np.float32))
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=s,
                        num_total=n)
    key = jax.random.PRNGKey(0)
    prior = gmm.make_prior(k, d)
    f32 = lambda t: jax.tree.map(lambda p: p.astype(jnp.float32), t)  # noqa: E731
    nn = f32(svae.init_params(key, d_in, config, (16,), (16,)))
    nat = f32(gmm.init_variational(key, prior))
    prior = f32(prior)
    eps = jnp.asarray(rng.standard_normal((s, n, k, d)).astype(np.float32))

    out_x = svae.forward(nn, nat, prior, x, key, config, eps=eps)
    out_f = svae.forward(
        nn, nat, prior, x, key, config._replace(fused_combine=True), eps=eps
    )
    np.testing.assert_allclose(float(out_f.elbo), float(out_x.elbo),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f.suff_stats.scatter_stat),
                               np.asarray(out_x.suff_stats.scatter_stat),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f.posterior.mean),
                               np.asarray(out_x.posterior.mean),
                               rtol=1e-5, atol=1e-5)

    # Gradients through the full forward agree too.
    def loss(nn_params, fused):
        cfg = config._replace(fused_combine=fused)
        return -svae.forward(nn_params, nat, prior, x, key, cfg, eps=eps).elbo

    g_f = jax.grad(lambda p: loss(p, True))(nn)
    g_x = jax.grad(lambda p: loss(p, False))(nn)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # The fused posterior omits chol/cov/logdet (VMEM-resident by design);
    # consumers that need them must fail with the descriptive message, not
    # an opaque NoneType error.
    import pytest

    with pytest.raises(ValueError, match="fused combine kernel"):
        svae.sample_posterior(key, out_f.posterior, 2)
    with pytest.raises(ValueError, match="fused combine kernel"):
        svae.local_kl_term(out_f.posterior,
                           gmm.expected_params(nat))


def test_combine_fused_seed_mode_requires_seed():
    """eps=None without a seed must fail loudly (the kernel_rng contract),
    and eps=None in interpret mode must fail rather than silently emit
    garbage (the TPU PRNG primitives have no CPU lowering)."""
    n, k, d, s = 32, 4, 2, 1
    pot_h, pot_p, exp, _ = _inputs(n, k, d, s, seed=3)
    with pytest.raises(AssertionError, match="seed"):
        cp.combine_fused(pot_h, pot_p, exp, None, s, interpret=True)


def test_kernel_rng_gates_to_threefry_off_tpu(monkeypatch):
    """SvaeConfig.kernel_rng is a TPU-only fast path: under the interpret
    hook (the CPU/CI stand-in) svae.forward must fall back to threefry ε
    and reproduce kernel_rng=False bit-for-bit, so configs pinning
    kernel_rng=True (bigk-dp) stay portable."""
    from svax.models.svae import SvaeConfig

    monkeypatch.setattr(svae, "_COMBINE_INTERPRET", True)
    n, k, d, s, d_in = 40, 5, 2, 2, 2
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((n, d_in)).astype(np.float32))
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=s,
                        num_total=n, fused_combine=True)
    key = jax.random.PRNGKey(0)
    prior = gmm.make_prior(k, d)
    f32 = lambda t: jax.tree.map(lambda p: p.astype(jnp.float32), t)  # noqa: E731
    nn = f32(svae.init_params(key, d_in, config, (16,), (16,)))
    nat = f32(gmm.init_variational(key, prior))
    prior = f32(prior)

    out_off = svae.forward(nn, nat, prior, x, key, config)
    out_on = svae.forward(nn, nat, prior, x, key,
                          config._replace(kernel_rng=True))
    assert float(out_on.elbo) == float(out_off.elbo)


def test_fused_combine_external_norm_matches_local_softmax():
    """log_norm = lse(log ρ) from the ρ-kernel reproduces the in-kernel
    softmax path exactly — values AND gradients (the flash-softmax
    decomposition used for component parallelism, single-device case)."""
    n, k, d, s = 40, 5, 3, 2
    pot_h, pot_p, exp, eps = _inputs(n, k, d, s, seed=5)

    log_rho = cp.log_rho_fused(pot_h, pot_p, exp, interpret=True)
    assert log_rho.shape == (n, k)
    # The ρ-kernel itself matches the oracle's pre-softmax logits.
    post = svae.sin_combine(pot_h, pot_p, exp)
    lse = jax.nn.logsumexp(log_rho, axis=-1)
    np.testing.assert_allclose(np.asarray(log_rho - lse[:, None]),
                               np.asarray(post.log_resp),
                               rtol=2e-5, atol=2e-5)

    out_local = cp.combine_fused(pot_h, pot_p, exp, eps, s, interpret=True)
    out_norm = cp.combine_fused(pot_h, pot_p, exp, eps, s, interpret=True,
                                log_norm=lse)
    for a, b in zip(jax.tree.leaves(out_local), jax.tree.leaves(out_norm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def scalar(ph, pp, e, use_norm):
        if use_norm:
            lr = cp.log_rho_fused(ph, pp, e, interpret=True)
            nrm = jax.nn.logsumexp(lr, axis=-1)
        else:
            nrm = None
        z, lr2, mean, local, st = cp.combine_fused(
            ph, pp, e, eps, s, interpret=True, log_norm=nrm)
        resp = jnp.exp(lr2)
        return (jnp.sum(resp * jnp.sum(jnp.tanh(z), axis=(0, -1)))
                - jnp.sum(local) + 0.01 * jnp.sum(st.scatter_stat))

    g_n = jax.grad(scalar, argnums=(0, 1, 2))(pot_h, pot_p, exp, True)
    g_l = jax.grad(scalar, argnums=(0, 1, 2))(pot_h, pot_p, exp, False)
    for a, b in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_combine_comp_sharded(monkeypatch):
    """The fused combine under COMPONENT sharding: a 4-way K-shard mesh
    with the ρ-kernel + cross-shard lse + norm-input heavy kernel matches
    the single-device XLA forward at matched eps — ELBO pieces, statistics,
    and NN gradients (which flow through the lse's psum/pmax)."""
    from jax.sharding import Mesh, PartitionSpec as P

    monkeypatch.setattr(svae, "_COMBINE_INTERPRET", True)
    from svax.models.svae import SvaeConfig

    n, k, d, s, d_in, n_comp = 32, 8, 2, 2, 2, 4
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((n, d_in)).astype(np.float32))
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=s,
                        num_total=n, fused_combine=True)
    key = jax.random.PRNGKey(0)
    prior = gmm.make_prior(k, d)
    f32 = lambda t: jax.tree.map(lambda p: p.astype(jnp.float32), t)  # noqa: E731
    nn = f32(svae.init_params(key, d_in, config, (8,), (8,)))
    nat = f32(gmm.init_variational(key, prior))
    prior = f32(prior)
    eps = jnp.asarray(rng.standard_normal((s, n, k, d)).astype(np.float32))

    # Single-device XLA oracle (fused off).
    cfg_x = config._replace(fused_combine=False)
    out_ref = svae.forward(nn, nat, prior, x, key, cfg_x, eps=eps)
    g_ref = jax.grad(
        lambda p: -svae.forward(nn_params=p, pgm_nat=nat, prior_nat=prior,
                                x=x, key=key, config=cfg_x, eps=eps).elbo
    )(nn)

    mesh = Mesh(np.asarray(jax.devices()[:n_comp]), ("comp",))
    nat_spec = jax.tree.map(lambda _: P("comp"), nat)

    def body(nn_p, nat_l, prior_l, eps_l):
        out = svae.forward(nn_p, nat_l, prior_l, x, key, config, eps=eps_l,
                           axis_comp="comp")
        g = jax.grad(
            lambda p: -svae.forward(p, nat_l, prior_l, x, key, config,
                                    eps=eps_l, axis_comp="comp").elbo
        )(nn_p)
        # psum/ndev: forward psums recon/local over comp inside the loss,
        # so Σ_shards ∇(global loss) = ndev·∇F (the svae_step recipe).
        g = jax.tree.map(lambda t: t / jax.lax.psum(1, "comp"),
                         jax.lax.psum(g, "comp"))
        return (out.elbo, out.recon, out.local_kl, out.global_kl,
                out.suff_stats, g)

    elbo, recon, local, gkl, stats, g = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), nat_spec, nat_spec, P(None, None, "comp", None)),
            out_specs=(P(), P(), P(), P(),
                       jax.tree.map(lambda _: P("comp"),
                                    out_ref.suff_stats),
                       P()),
            check_vma=False,
        )
    )(nn, nat, prior, eps)

    np.testing.assert_allclose(float(recon), float(out_ref.recon), rtol=2e-4)
    np.testing.assert_allclose(float(local), float(out_ref.local_kl),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(gkl), float(out_ref.global_kl),
                               rtol=1e-5)
    np.testing.assert_allclose(float(elbo), float(out_ref.elbo), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(stats),
                    jax.tree.leaves(out_ref.suff_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_combine_inside_shard_map(monkeypatch):
    """The kernel runs under shard_map (DP): the closed-form CVI update
    must equal the single-device fused step exactly (sufficient statistics
    are mesh-invariant; only the MC recon noise differs per shard)."""
    import optax

    from svax.models.svae import SvaeConfig
    from svax.parallel import mesh as pmesh
    from svax.train import svae_step
    from svax.data import make_pinwheel_data

    monkeypatch.setattr(svae, "_COMBINE_INTERPRET", True)
    n, k, d = 64, 4, 2
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=1,
                        num_total=n, fused_combine=True)
    prior = gmm.make_prior(k, d)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(
        make_pinwheel_data(num_classes=4, num_per_class=16, seed=0)[:n],
        jnp.float32,
    )
    state = svae_step.init_state(key, 2, config, prior, opt, (8,), (8,),
                                 data=x)
    m = pmesh.make_data_mesh()
    dp = pmesh.data_parallel_step(
        svae_step.make_train_step(config, prior, opt, rho=0.1,
                                  axis_name="data"), m)
    state_dp, metrics_dp = dp(state, pmesh.shard_batch(m, x), key)
    state_1, _ = jax.jit(
        svae_step.make_train_step(config, prior, opt, rho=0.1)
    )(state, x, key)
    assert np.isfinite(float(metrics_dp["elbo"]))
    for a, b in zip(jax.tree.leaves(state_dp.pgm_nat),
                    jax.tree.leaves(state_1.pgm_nat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
