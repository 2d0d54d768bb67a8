"""Full-covariance encoder head (SvaeConfig.encoder_head="full").

Capability extension motivated by the round-4 redraw-gap probe: the
diagonal recognition family is part of the residual gap on hard draws.
Design contract (svax/nets/mlp.py): the full head's Cholesky diagonal is
1/√(softplus(raw) + floor), so ZERO off-diagonal outputs reproduce the
diagonal head EXACTLY — same variance floor, same guard semantics — and
"full" is a strict superset of "diag".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svax.models import evaluation, svae, svae_smm
from svax.models.svae import SvaeConfig
from svax.nets import mlp as nets
from svax.pgm import gmm


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _widen_to_full(diag_params: list, d: int) -> list:
    """Diag-head params → full-head params with ZERO off-diag outputs."""
    full = [dict(layer) for layer in diag_params]
    last = full[-1]
    t = d * (d - 1) // 2
    last["w"] = jnp.concatenate(
        [last["w"], jnp.zeros((last["w"].shape[0], t), last["w"].dtype)], axis=1
    )
    last["b"] = jnp.concatenate([last["b"], jnp.zeros((t,), last["b"].dtype)])
    return full


def test_out_dim_roundtrip():
    for d in range(1, 9):
        for head in ("diag", "full"):
            w = nets.encoder_out_dim(d, head)
            assert nets._latent_dim_from_width(w, head) == d
    with pytest.raises(ValueError):
        nets._latent_dim_from_width(7, "full")  # no d gives width 7


def test_full_head_zero_off_equals_diag(rng):
    """Zero off-diagonal outputs: the full head IS the diag head.

    P must equal diag(p) exactly (same softplus+floor pipeline up to the
    1/√·² round-trip) and h must match mean·p."""
    d_in, d = 5, 3
    key = jax.random.PRNGKey(1)
    diag_params = nets.encoder_init(key, d_in, (16,), d)
    full_params = _widen_to_full(diag_params, d)
    x = jnp.asarray(rng.standard_normal((7, d_in)).astype(np.float32))

    h_d, p_d = nets.encoder_apply(diag_params, x)
    h_f, p_f = nets.encoder_apply(full_params, x, head="full")
    assert p_f.shape == (7, d, d)
    # off-diagonals identically zero; diagonal equals (1/√p)² = p
    off = p_f - p_f * jnp.eye(d)
    np.testing.assert_array_equal(np.asarray(off), 0.0)
    np.testing.assert_allclose(
        np.asarray(p_f[:, jnp.arange(d), jnp.arange(d)]), np.asarray(p_d),
        rtol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_d), rtol=1e-5,
                               atol=1e-6)


def test_full_head_potential_is_psd(rng):
    """Arbitrary final-layer outputs always yield PSD P (up to f32
    rounding of the LLᵀ product: tiny negative eigenvalues at the
    ~1e-7·‖P‖ level are f32 noise, not a parameterization defect —
    downstream the combine adds the PD E[Λ_k], so J̃ stays PD)."""
    d_in, d = 4, 4
    params = nets.encoder_init(jax.random.PRNGKey(2), d_in, (8,), d,
                               head="full")
    # crank the outputs to extreme values
    params[-1]["b"] = params[-1]["b"] + jnp.asarray(
        rng.uniform(-30, 30, params[-1]["b"].shape).astype(np.float32)
    )
    x = jnp.asarray(10.0 * rng.standard_normal((9, d_in)).astype(np.float32))
    _, p = nets.encoder_apply(params, x, head="full")
    p64 = np.asarray(p, np.float64)
    np.testing.assert_allclose(p64, np.swapaxes(p64, -1, -2))  # symmetric
    eigs = np.linalg.eigvalsh(p64)
    scale = np.abs(eigs).max(axis=-1, keepdims=True)
    assert np.all(eigs > -1e-6 * scale), (eigs.min(), scale.max())


def _setup_forward(rng, head: str, likelihood: str = "gaussian",
                   dof: float = 0.0):
    n, d_in, d, k = 12, 4, 3, 5
    config = SvaeConfig(
        latent_dim=d, num_components=k, num_samples=2, num_total=n,
        likelihood=likelihood, encoder_head=head, dof=dof,
    )
    x = jnp.asarray(rng.standard_normal((n, d_in)).astype(np.float32))
    if likelihood == "bernoulli":
        x = jax.nn.sigmoid(x)
    nn = svae.init_params(jax.random.PRNGKey(3), d_in, config)
    prior = gmm.make_prior(k, d)
    nat = gmm.init_variational(jax.random.PRNGKey(4), prior)
    return config, nn, nat, prior, x


def test_forward_full_head(rng):
    """forward() with the full head: finite ELBO, local KL ≥ 0, finite
    grads through encoder AND decoder, and the posterior matches an
    explicit encoder_apply → sin_combine recomputation."""
    config, nn, nat, prior, x = _setup_forward(rng, "full")
    key = jax.random.PRNGKey(5)

    out = jax.jit(svae.forward, static_argnums=(5,))(
        nn, nat, prior, x, key, config
    )
    assert np.isfinite(float(out.elbo))
    assert float(out.local_kl) >= 0.0

    pot_h, pot_p = nets.encoder_apply(
        nn["encoder"], x, config.activation, head="full"
    )
    post = svae.sin_combine(pot_h, pot_p, gmm.expected_params(nat))
    np.testing.assert_allclose(
        np.asarray(out.posterior.mean), np.asarray(post.mean),
        rtol=1e-5, atol=1e-7,  # jit-vs-eager f32 re-association noise
    )

    def loss(nn_):
        return -svae.forward(nn_, nat, prior, x, key, config).elbo

    g = jax.grad(loss)(nn)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(le))) for le in leaves)
    # the off-diagonal head columns must receive gradient signal
    t = config.latent_dim * (config.latent_dim - 1) // 2
    g_off = np.asarray(g["encoder"][-1]["w"])[:, -t:]
    assert np.any(g_off != 0.0)


def test_forward_full_head_matches_diag_at_zero_off(rng):
    """Widening a trained-diag encoder with zero off columns leaves the
    whole forward pass numerically unchanged (same eps)."""
    config_d, nn, nat, prior, x = _setup_forward(rng, "diag")
    config_f = config_d._replace(encoder_head="full")
    nn_f = dict(nn)
    nn_f["encoder"] = _widen_to_full(nn["encoder"], config_d.latent_dim)
    eps = jnp.asarray(rng.standard_normal(
        (config_d.num_samples, x.shape[0], config_d.num_components,
         config_d.latent_dim)
    ).astype(np.float32))
    key = jax.random.PRNGKey(6)
    out_d = svae.forward(nn, nat, prior, x, key, config_d, eps=eps)
    out_f = svae.forward(nn_f, nat, prior, x, key, config_f, eps=eps)
    np.testing.assert_allclose(
        float(out_d.elbo), float(out_f.elbo), rtol=1e-6
    )


def test_full_head_iw_eval(rng):
    config, nn, nat, _, x = _setup_forward(rng, "full")
    iw = evaluation.svae_iw_loglik(
        nn, nat, x, jax.random.PRNGKey(7), config, num_samples=16
    )
    assert iw.shape == (x.shape[0],)
    assert np.all(np.isfinite(np.asarray(iw)))


def test_smm_forward_full_head(rng):
    """The Student-t (SMM) prior composes with the full head too: the
    u–z rounds only need P as a (N, d, d) message."""
    config, nn, nat, prior, x = _setup_forward(rng, "full", dof=4.0)
    out = svae_smm.forward(nn, nat, prior, x, jax.random.PRNGKey(8), config)
    assert np.isfinite(float(out.elbo))
    iw = evaluation.svae_smm_iw_loglik(
        nn, nat, x, jax.random.PRNGKey(9), config, num_samples=8
    )
    assert np.all(np.isfinite(np.asarray(iw)))


def test_warmup_latent_means_full(rng):
    """encoded_latent_means solves P·m = h for the full head; embedding a
    diag potential gives exactly h/p."""
    from svax.train.warmup import encoded_latent_means

    d_in, d = 4, 3
    diag_params = nets.encoder_init(jax.random.PRNGKey(10), d_in, (8,), d)
    full_params = _widen_to_full(diag_params, d)
    x = jnp.asarray(rng.standard_normal((6, d_in)).astype(np.float32))
    m_d = encoded_latent_means({"encoder": diag_params}, x)
    m_f = encoded_latent_means({"encoder": full_params}, x, head="full")
    np.testing.assert_allclose(np.asarray(m_d), np.asarray(m_f), rtol=1e-5,
                               atol=1e-6)


def test_megakernel_gate_rejects_full_head():
    from svax.train.loop import megakernel_unsupported_reason

    config = SvaeConfig(latent_dim=2, num_components=4, num_samples=1,
                        num_total=10, encoder_head="full")
    reason = megakernel_unsupported_reason(
        config, batch_full=True, encoder_hidden=(50, 50),
        decoder_hidden=(50, 50), rho=0.05, input_dim=2,
    )
    assert reason is not None
    # and the diag twin IS eligible (the gate is the head, nothing else)
    assert megakernel_unsupported_reason(
        config._replace(encoder_head="diag"), batch_full=True,
        encoder_hidden=(50, 50), decoder_hidden=(50, 50), rho=0.05,
        input_dim=2,
    ) is None
