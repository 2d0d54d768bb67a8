"""L2 SVAE tests: combine oracle, closed-form local term vs Monte Carlo,
ELBO improvement, finite gradients (SURVEY.md §5 integration tier)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import make_pinwheel_data
from svax.models import svae
from svax.models.svae import SvaeConfig
from svax.pgm import gmm
from svax.train import svae_step


def make_exp(rng, k, d):
    from svax.expfam import niw

    m = rng.standard_normal((k, d))
    kappa = rng.uniform(0.5, 2.0, k)
    a = rng.standard_normal((k, d, d))
    phi = np.einsum("kij,klj->kil", a, a) + d * np.eye(d)
    nu = rng.uniform(d + 1.5, d + 4.0, k)
    nat = gmm.GmmNat(
        dir_nat=jnp.asarray(rng.uniform(0.5, 3.0, k) - 1.0),
        niw_nat=niw.standard_to_natural(
            niw.NiwStandard(jnp.asarray(m), jnp.asarray(kappa), jnp.asarray(phi), jnp.asarray(nu))
        ),
    )
    return nat, gmm.expected_params(nat)


def test_sin_combine_against_dense_solve(rng):
    """μ̃, Σ̃, log|J̃| from the unrolled path match dense numpy solves."""
    n, k, d = 7, 3, 3
    _, exp = make_exp(rng, k, d)
    pot_p = rng.uniform(0.5, 2.0, (n, d))
    pot_h = rng.standard_normal((n, d))
    post = svae.sin_combine(jnp.asarray(pot_h), jnp.asarray(pot_p), exp)
    prec_np = np.asarray(exp.prec)
    for i in range(n):
        for j in range(k):
            jt = np.diag(pot_p[i]) + prec_np[j]
            ht = pot_h[i] + np.asarray(exp.prec_mean)[j]
            np.testing.assert_allclose(
                np.asarray(post.mean)[i, j], np.linalg.solve(jt, ht), rtol=1e-8
            )
            np.testing.assert_allclose(
                np.asarray(post.cov)[i, j], np.linalg.inv(jt), rtol=1e-8
            )
            np.testing.assert_allclose(
                np.asarray(post.logdet_prec)[i, j], np.linalg.slogdet(jt)[1], rtol=1e-9
            )


def test_sin_combine_full_potential(rng):
    """(N, d, d) full-covariance potentials: embedding a diagonal potential
    as a full matrix reproduces the diagonal path exactly, and a general
    PSD potential matches dense numpy solves + the §9.4 product
    normalizer (the per-n constants cancel in the softmax for any P)."""
    from svax.expfam import mvn

    n, k, d = 5, 3, 3
    _, exp = make_exp(rng, k, d)
    pot_p = rng.uniform(0.5, 2.0, (n, d))
    pot_h = rng.standard_normal((n, d))

    # 1. diag-as-full == diag, exactly
    diag_post = svae.sin_combine(jnp.asarray(pot_h), jnp.asarray(pot_p), exp)
    eye = np.eye(d)
    full_from_diag = jnp.asarray(pot_p[:, :, None] * eye)
    full_post = svae.sin_combine(jnp.asarray(pot_h), full_from_diag, exp)
    for a, b in zip(diag_post, full_post):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 2. general PSD potential vs dense numpy + product normalizer
    a_mat = rng.standard_normal((n, d, d))
    p_full = np.einsum("nij,nlj->nil", a_mat, a_mat) + 0.5 * eye
    post = svae.sin_combine(jnp.asarray(pot_h), jnp.asarray(p_full), exp)
    prec_np = np.asarray(exp.prec)
    log_rho = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            jt = p_full[i] + prec_np[j]
            ht = pot_h[i] + np.asarray(exp.prec_mean)[j]
            np.testing.assert_allclose(
                np.asarray(post.mean)[i, j], np.linalg.solve(jt, ht), rtol=1e-7
            )
            np.testing.assert_allclose(
                np.asarray(post.cov)[i, j], np.linalg.inv(jt), rtol=1e-7
            )
            g_k = (
                0.5 * float(exp.logdet[j])
                - 0.5 * d * np.log(2 * np.pi)
                - 0.5 * float(exp.quad[j])
            )
            log_rho[i, j] = float(exp.log_pi[j]) + g_k + float(
                mvn.log_partition(mvn.GaussianNat(h=jnp.asarray(ht), prec=jnp.asarray(jt)))
            )
    want = log_rho - jax.nn.logsumexp(jnp.asarray(log_rho), axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(post.log_resp), np.asarray(want), rtol=1e-6, atol=1e-7
    )


def test_responsibilities_match_product_normalizer(rng):
    """log r̃ matches E[logπ] + log-normalizer of the Gaussian product (§9.4),
    computed independently via mvn.log_partition differences."""
    from svax.expfam import mvn

    n, k, d = 5, 4, 2
    _, exp = make_exp(rng, k, d)
    pot_p = rng.uniform(0.5, 2.0, (n, d))
    pot_h = rng.standard_normal((n, d))
    post = svae.sin_combine(jnp.asarray(pot_h), jnp.asarray(pot_p), exp)

    log_rho = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            joint = mvn.GaussianNat(
                h=jnp.asarray(pot_h[i] + np.asarray(exp.prec_mean)[j]),
                prec=jnp.asarray(np.diag(pot_p[i]) + np.asarray(exp.prec)[j]),
            )
            # ḡ_k + A(joint); the encoder-potential partition is k-const.
            g_k = (
                0.5 * float(exp.logdet[j])
                - 0.5 * d * np.log(2 * np.pi)
                - 0.5 * float(exp.quad[j])
            )
            log_rho[i, j] = float(exp.log_pi[j]) + g_k + float(mvn.log_partition(joint))
    want = log_rho - jax.nn.logsumexp(jnp.asarray(log_rho), axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(post.log_resp), np.asarray(want), rtol=1e-7, atol=1e-8)


@pytest.mark.slow
def test_local_kl_closed_form_vs_monte_carlo(rng, key):
    """The closed-form local term equals an MC estimate of
    E_q[log q(z,k|x) − log p̄(z,k)] (SURVEY.md §9.6)."""
    n, k, d = 3, 3, 2
    _, exp = make_exp(rng, k, d)
    pot_p = rng.uniform(0.5, 2.0, (n, d))
    pot_h = rng.standard_normal((n, d))
    post = svae.sin_combine(jnp.asarray(pot_h), jnp.asarray(pot_p), exp)
    closed = np.asarray(svae.local_kl_term(post, exp))

    s = 150_000
    z = svae.sample_posterior(key, post, s)  # (S, N, K, d)
    # log q(z, k | x) = log r̃ + log N(z; μ̃, Σ̃)
    diff = np.asarray(z) - np.asarray(post.mean)[None]
    prec = np.asarray(jnp.einsum("nkil,nkjl->nkij", post.prec_chol, post.prec_chol))
    quad = np.einsum("snki,nkij,snkj->snk", diff, prec, diff)
    log_q_z = (
        -0.5 * quad
        + 0.5 * np.asarray(post.logdet_prec)[None]
        - 0.5 * d * np.log(2 * np.pi)
    )
    log_q = np.asarray(post.log_resp)[None] + log_q_z
    # log p̄(z, k) = E[logπ_k] + ḡ_k + h̄ᵀz − ½ zᵀJ̄z
    g_k = 0.5 * np.asarray(exp.logdet) - 0.5 * d * np.log(2 * np.pi) - 0.5 * np.asarray(exp.quad)
    quad_p = np.einsum("snki,kij,snkj->snk", np.asarray(z), np.asarray(exp.prec), np.asarray(z))
    cross_p = np.einsum("snki,ki->snk", np.asarray(z), np.asarray(exp.prec_mean))
    log_pbar = np.asarray(exp.log_pi)[None, None] + g_k[None, None] + cross_p - 0.5 * quad_p
    resp = np.exp(np.asarray(post.log_resp))
    mc = np.sum(resp[None] * (log_q - log_pbar), axis=-1).mean(0)
    np.testing.assert_allclose(closed, mc, rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_elbo_improves_on_pinwheel(key):
    """SVAE ELBO strictly improves over the first training phase (§5)."""
    x = jnp.asarray(make_pinwheel_data(num_classes=5, num_per_class=40, seed=0), dtype=jnp.float64)
    n = x.shape[0]
    config = SvaeConfig(latent_dim=2, num_components=6, num_samples=2, num_total=n)
    prior = gmm.make_prior(6, 2, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    state = svae_step.init_state(
        key, 2, config, prior, opt, encoder_hidden=(32,), decoder_hidden=(32,), dtype=jnp.float64
    )
    step = jax.jit(svae_step.make_train_step(config, prior, opt, rho=0.05))
    k = key
    elbos = []
    for i in range(60):
        k, sub = jax.random.split(k)
        state, metrics = step(state, x, sub)
        elbos.append(float(metrics["elbo"]))
    assert np.isfinite(elbos).all()
    assert np.mean(elbos[-10:]) > np.mean(elbos[:10]) + 100.0, elbos[::10]


@pytest.mark.slow
def test_gradients_finite_and_nonzero(key):
    x = jnp.asarray(make_pinwheel_data(num_classes=3, num_per_class=10, seed=1), dtype=jnp.float64)
    n = x.shape[0]
    config = SvaeConfig(latent_dim=2, num_components=4, num_samples=1, num_total=n)
    prior = gmm.make_prior(4, 2, dtype=jnp.float64)
    nn = svae.init_params(key, 2, config, (16,), (16,), dtype=jnp.float64)
    from svax.pgm import gmm as gmm_mod

    pgm_nat = gmm_mod.init_variational(key, prior, x)

    def loss(nn):
        return -svae.forward(nn, pgm_nat, prior, x, key, config).elbo

    g = jax.grad(loss)(nn)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0.0


@pytest.mark.slow
def test_bernoulli_likelihood_path(key):
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.uniform(size=(20, 12)) > 0.5).astype(np.float64))
    config = SvaeConfig(
        latent_dim=3, num_components=4, num_samples=2, likelihood="bernoulli", num_total=20
    )
    prior = gmm.make_prior(4, 3, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    state = svae_step.init_state(key, 12, config, prior, opt, (16,), (16,), dtype=jnp.float64)
    step = jax.jit(svae_step.make_train_step(config, prior, opt, rho=0.1))
    state, metrics = step(state, x, key)
    assert np.isfinite(float(metrics["elbo"]))
