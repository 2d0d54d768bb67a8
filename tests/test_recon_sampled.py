"""Sampled-component reconstruction estimator (SvaeConfig.recon_mode).

The 'sampled' mode decodes one k̂ ~ Cat(r̃) per (s, n) instead of all K
components. These tests pin its contract: the VALUE is an unbiased
estimator of the weighted recon term, the DECODER gradient is unbiased,
and the REINFORCE surrogate recovers the encoder's ∂r̃ pathway (all
checked by Monte-Carlo against the exact weighted mode). The local/global
KL terms and CVI statistics must be bit-identical between modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svax.models import svae
from svax.models.svae import SvaeConfig
from svax.pgm import gmm

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _setup(likelihood="gaussian", d_in=2, s=2, n=40, k=5, seed=0):
    config = SvaeConfig(
        latent_dim=2, num_components=k, num_samples=s, likelihood=likelihood,
        num_total=n,
    )
    key = jax.random.PRNGKey(seed)
    prior = gmm.make_prior(k, 2)
    f32 = lambda t: jax.tree.map(lambda p: p.astype(jnp.float32), t)  # noqa: E731
    nn = f32(svae.init_params(key, d_in, config, (16,), (16,)))
    nat = f32(gmm.init_variational(key, prior))
    prior = f32(prior)
    rng = np.random.default_rng(seed)
    if likelihood == "bernoulli":
        x = jnp.asarray((rng.random((n, d_in)) > 0.5).astype(np.float32))
    else:
        x = jnp.asarray(rng.standard_normal((n, d_in)).astype(np.float32))
    return config, prior, nn, nat, x


def test_sampled_value_unbiased():
    config, prior, nn, nat, x = _setup()
    key = jax.random.PRNGKey(1)
    exact = svae.forward(nn, nat, prior, x, key, config)

    cfg_s = config._replace(recon_mode="sampled")
    fwd = jax.jit(lambda k: svae.forward(nn, nat, prior, x, k, cfg_s).recon)
    keys = jax.random.split(jax.random.PRNGKey(2), 400)
    recons = jax.vmap(fwd)(keys)
    # The weighted recon is itself an MC estimate over z; average it too.
    fwd_w = jax.jit(lambda k: svae.forward(nn, nat, prior, x, k, config).recon)
    recons_w = jax.vmap(fwd_w)(keys)
    m_s, m_w = float(jnp.mean(recons)), float(jnp.mean(recons_w))
    se = float(jnp.std(recons) / np.sqrt(len(keys)))
    assert abs(m_s - m_w) < 5 * se + 1e-3, (m_s, m_w, se)
    # KL terms and CVI stats are closed-form — identical across modes.
    out_s = svae.forward(nn, nat, prior, x, key, cfg_s)
    np.testing.assert_allclose(
        np.asarray(out_s.local_kl), np.asarray(exact.local_kl), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_s.suff_stats.counts),
        np.asarray(exact.suff_stats.counts), rtol=1e-6,
    )


@pytest.mark.parametrize("part", ["decoder", "encoder"])
def test_sampled_gradient_unbiased(part):
    config, prior, nn, nat, x = _setup(s=4, n=30, k=4)
    cfg_s = config._replace(recon_mode="sampled")

    def recon(params, k, cfg):
        merged = {**nn, part: params}
        return svae.forward(merged, nat, prior, x, k, cfg).recon

    keys = jax.random.split(jax.random.PRNGKey(3), 600)
    g_s = jax.vmap(lambda k: jax.flatten_util.ravel_pytree(
        jax.grad(recon)(nn[part], k, cfg_s))[0])(keys)
    g_w = jax.vmap(lambda k: jax.flatten_util.ravel_pytree(
        jax.grad(recon)(nn[part], k, config))[0])(keys)
    m_s, m_w = jnp.mean(g_s, axis=0), jnp.mean(g_w, axis=0)
    se = jnp.std(g_s, axis=0) / np.sqrt(g_s.shape[0])
    # Elementwise CLT band (tolerant: REINFORCE variance is real) plus a
    # direction check on the mean gradient.
    frac_in_band = float(jnp.mean(jnp.abs(m_s - m_w) < 6 * se + 1e-4))
    assert frac_in_band > 0.95, frac_in_band
    cos = float(jnp.vdot(m_s, m_w) / (jnp.linalg.norm(m_s) * jnp.linalg.norm(m_w)))
    assert cos > 0.95, cos


def test_sampled_trains_bernoulli():
    import optax

    from svax.train import svae_step

    config, prior, nn, nat, x = _setup(likelihood="bernoulli", d_in=12, n=64)
    cfg_s = config._replace(recon_mode="sampled")
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(key, 12, cfg_s, prior, opt, (16,), (16,))
    state = state._replace(
        nn_params=jax.tree.map(lambda p: p.astype(jnp.float32), state.nn_params),
        pgm_nat=jax.tree.map(lambda p: p.astype(jnp.float32), state.pgm_nat),
    )
    step = jax.jit(svae_step.make_train_step(cfg_s, jax.tree.map(
        lambda p: p.astype(jnp.float32), prior), opt, rho=0.1))
    first = None
    for i in range(60):
        state, m = step(state, x, jax.random.fold_in(key, i))
        if first is None:
            first = float(m["elbo"])
    assert float(m["elbo"]) > first
    assert np.isfinite(float(m["elbo"]))


def test_sampled_rejects_comp_sharding():
    config, prior, nn, nat, x = _setup()
    cfg_s = config._replace(recon_mode="sampled")
    with pytest.raises(AssertionError):
        svae.forward(nn, nat, prior, x, jax.random.PRNGKey(0), cfg_s,
                     axis_comp="comp")
