"""SMM-prior (Student-t latent mixture) SVAE tests (svax/models/svae_smm.py).

Anchors: (a) dof → ∞ collapses every formula to the GMM-prior SVAE (the
same reduction the data-space SMM is tested with); (b) the u–z coordinate
updates reach their fixed point; (c) the combined Adam+CVI step trains;
(d) outlier latents get downweighted (E[u] < 1) — the robustness property
the Student-t prior exists for.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import make_pinwheel_data
from svax.models import svae, svae_smm
from svax.models.svae import SvaeConfig
from svax.pgm import gmm
from svax.train import svae_step

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _setup(dof, n=80, k=5, d=2, s=2, dtype=jnp.float64, smm_iters=2):
    x = jnp.asarray(
        make_pinwheel_data(num_classes=4, num_per_class=n // 4, seed=3), dtype
    )[:n]
    key = jax.random.PRNGKey(7)
    config = SvaeConfig(
        latent_dim=d, num_components=k, num_samples=s, num_total=n,
        dof=dof, smm_iters=smm_iters,
    )
    prior = gmm.make_prior(k, d, dtype=dtype)
    nn = svae.init_params(key, 2, config, (16,), (16,), dtype=dtype)
    nat = gmm.init_variational(key, prior, x)
    eps = jnp.asarray(
        np.random.default_rng(0).standard_normal((s, n, k, d)), dtype
    )
    return x, key, config, prior, nn, nat, eps


def test_dof_infinity_reduces_to_gmm_svae():
    x, key, config, prior, nn, nat, eps = _setup(dof=1e9)
    out_smm = svae_smm.forward(nn, nat, prior, x, key, config, eps=eps)
    out_gmm = svae.forward(nn, nat, prior, x, key, config._replace(dof=0.0), eps=eps)

    np.testing.assert_allclose(
        np.asarray(out_smm.posterior.log_resp),
        np.asarray(out_gmm.posterior.log_resp), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_smm.posterior.mean), np.asarray(out_gmm.posterior.mean),
        rtol=1e-6, atol=1e-8,
    )
    rel = abs(float(out_smm.elbo - out_gmm.elbo)) / abs(float(out_gmm.elbo))
    assert rel < 1e-5, f"ELBO rel dev {rel:.2e} at dof→∞"
    # u-weighted stats coincide with the GMM stats when E[u] ≡ 1.
    np.testing.assert_allclose(
        np.asarray(out_smm.suff_stats.u_counts),
        np.asarray(out_smm.suff_stats.counts), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_smm.suff_stats.mean_stat),
        np.asarray(out_gmm.suff_stats.mean_stat), rtol=1e-5, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(out_smm.suff_stats.scatter_stat),
        np.asarray(out_gmm.suff_stats.scatter_stat), rtol=1e-5, atol=1e-8,
    )


def test_u_coordinate_fixed_point():
    """After enough rounds, one more u-update is a no-op (fixed point)."""
    x, key, config, prior, nn, nat, eps = _setup(dof=4.0, smm_iters=40)
    exp = gmm.expected_params(nat)
    from svax.nets import mlp as nets

    pot_h, pot_p = nets.encoder_apply(nn["encoder"], x, config.activation)
    post, _ = svae_smm.smm_combine(pot_h, pot_p, exp, 4.0, num_iters=40)
    a = 0.5 * 4.0 + 0.5 * config.latent_dim
    quad = svae_smm._quad_latent(post.mean, post.cov, exp)
    e_u_next = a / (0.5 * 4.0 + 0.5 * quad)
    np.testing.assert_allclose(
        np.asarray(e_u_next), np.asarray(post.e_u), rtol=1e-8
    )


def test_smm_svae_trains_and_improves():
    """Combined Adam+CVI step through svae_step with model=svae_smm."""
    x, key, config, prior, nn, nat, eps = _setup(dof=4.0, dtype=jnp.float64)
    opt = optax.adam(3e-3)
    state = svae_step.init_state(
        key, 2, config, prior, opt, (16,), (16,), data=x, dtype=jnp.float64
    )
    step = jax.jit(
        svae_step.make_train_step(config, prior, opt, rho=0.3, model=svae_smm)
    )
    elbos = []
    for t in range(40):
        state, metrics = step(state, x, jax.random.fold_in(key, t))
        elbos.append(float(metrics["elbo"]))
        assert np.isfinite(elbos[-1])
    assert elbos[-1] > elbos[0] + 0.2 * abs(elbos[0]), (elbos[0], elbos[-1])

    evaluate = jax.jit(svae_step.make_eval_fn(config, prior, model=svae_smm))
    ev = evaluate(state, x, key)
    assert np.isfinite(float(ev["elbo_per_point"]))


def test_outliers_are_downweighted():
    """Points far from every component get E[u] < typical points' E[u]."""
    x, key, config, prior, nn, nat, eps = _setup(dof=4.0, smm_iters=10)
    # Append gross outliers in INPUT space; with an identity-ish fresh
    # encoder they land far out in latent space too.
    x_out = jnp.concatenate([x, 25.0 * jnp.ones((4, 2), x.dtype)], axis=0)
    exp = gmm.expected_params(nat)
    from svax.nets import mlp as nets

    pot_h, pot_p = nets.encoder_apply(nn["encoder"], x_out, config.activation)
    post, _ = svae_smm.smm_combine(pot_h, pot_p, exp, 4.0, num_iters=10)
    resp = jnp.exp(post.log_resp)
    e_u_eff = jnp.sum(resp * post.e_u, axis=-1)  # (N,)
    typical = float(jnp.median(e_u_eff[:-4]))
    outlier = float(jnp.max(e_u_eff[-4:]))
    assert outlier < typical, (outlier, typical)


def test_forward_f32_matches_f64():
    x64, key, config, prior64, nn64, nat64, eps64 = _setup(dof=4.0)
    out64 = svae_smm.forward(nn64, nat64, prior64, x64, key, config, eps=eps64)

    cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.float32), t)  # noqa: E731
    out32 = svae_smm.forward(
        cast(nn64), cast(nat64), cast(prior64),
        x64.astype(jnp.float32), key, config, eps=eps64.astype(jnp.float32),
    )
    rel = abs(float(out32.elbo - out64.elbo)) / abs(float(out64.elbo))
    assert rel < 1e-4, f"f32 SMM-SVAE ELBO rel dev {rel:.2e}"


def test_smm_iw_loglik_reduces_to_gmm_iw():
    """dof → ∞: the Student-t expected-parameter density and the SMM IW
    bound both collapse to their GMM counterparts (same key, same draws)."""
    from svax.models import evaluation

    x, key, config, prior, nn, nat, eps = _setup(dof=1e9, n=40)
    iw_smm = evaluation.svae_smm_iw_loglik(nn, nat, x, key, config, num_samples=16)
    iw_gmm = evaluation.svae_iw_loglik(
        nn, nat, x, key, config._replace(dof=0.0), num_samples=16
    )
    np.testing.assert_allclose(
        np.asarray(iw_smm), np.asarray(iw_gmm), rtol=1e-5, atol=1e-6
    )


def test_expected_smm_log_prob_vs_quadrature():
    """The closed-form u-marginal matches numerical quadrature over u.

    p̄(z|k) = ∫ Gamma(u; a₀,b₀) · exp(E[log p(z|u,θ,k)]) du — like the GMM's
    p̄ = exp(E[log p]) this is intentionally UNNORMALIZED in z (Jensen gap),
    so the oracle is the u-integral, not ∫dz = 1.
    """
    from scipy.integrate import quad as scipy_quad
    from scipy.stats import gamma as scipy_gamma

    from svax.models import evaluation

    _, key, config, prior, nn, nat, _ = _setup(dof=4.0, k=3)
    exp = gmm.expected_params(nat)
    dof = 4.0
    a0 = b0 = 0.5 * dof
    d = 2
    zs = np.asarray([[0.3, -1.2], [5.0, 2.0], [-12.0, 7.0]])
    got = np.asarray(evaluation._expected_smm_log_prob(jnp.asarray(zs), exp, dof))

    prec = np.asarray(exp.prec)
    prec_mean = np.asarray(exp.prec_mean)
    quad_k = np.asarray(exp.quad)
    logdet = np.asarray(exp.logdet)
    log_pi = np.asarray(exp.log_pi)
    for zi, z in enumerate(zs):
        vals = []
        for k in range(3):
            q_z = z @ prec[k] @ z - 2.0 * z @ prec_mean[k] + quad_k[k]

            def integrand(u, k=k, q_z=q_z):
                e_logp = (
                    0.5 * d * np.log(u)
                    - 0.5 * d * np.log(2 * np.pi)
                    + 0.5 * logdet[k]
                    - 0.5 * u * q_z
                )
                return scipy_gamma.pdf(u, a=a0, scale=1.0 / b0) * np.exp(e_logp)

            val, _ = scipy_quad(integrand, 0.0, np.inf, limit=200)
            vals.append(np.exp(log_pi[k]) * val)
        want = np.log(np.sum(vals))
        np.testing.assert_allclose(got[zi], want, rtol=1e-6)


def test_envelope_grads_small_bias():
    """smm_envelope_grads cuts the u-round backward chains; at the u fixed
    point the cut cotangents vanish (envelope theorem), so with enough
    coordinate rounds the gradient bias must be far below the gradient
    scale — and the forward values must be bit-identical."""
    x = jnp.asarray(
        make_pinwheel_data(num_classes=3, num_per_class=16, seed=5),
        jnp.float32,
    )
    n = x.shape[0]
    base = SvaeConfig(latent_dim=2, num_components=4, num_samples=1,
                      num_total=n, dof=4.0, smm_iters=6)
    prior = jax.tree.map(lambda a: a.astype(jnp.float32),
                         gmm.make_prior(4, 2))
    key = jax.random.PRNGKey(3)
    nn = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        svae.init_params(key, 2, base, (8,), (8,)),
    )
    nat = jax.tree.map(lambda a: a.astype(jnp.float32),
                       gmm.init_variational(key, prior, x))
    eps = jax.random.normal(jax.random.PRNGKey(9), (1, n, 4, 2), jnp.float32)

    def loss(nn_p, cfg):
        return -svae_smm.forward(nn_p, nat, prior, x, key, cfg, eps=eps).elbo

    v_full = float(loss(nn, base))
    v_env = float(loss(nn, base._replace(smm_envelope_grads=True)))
    assert v_full == v_env  # stop_gradient never changes values

    g_full = jax.grad(lambda p: loss(p, base))(nn)
    g_env = jax.grad(
        lambda p: loss(p, base._replace(smm_envelope_grads=True))
    )(nn)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in
              zip(jax.tree.leaves(g_full), jax.tree.leaves(g_env)))
    den = sum(float(jnp.sum(a ** 2)) for a in jax.tree.leaves(g_full))
    rel = (num / den) ** 0.5
    assert rel < 0.02, f"envelope gradient bias too large: {rel}"
