"""SMM (Student-t mixture) tests: brute-force oracle, GMM limit, robustness."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import digamma as sp_digamma, gammaln as sp_gammaln

from svax.data import make_pinwheel_data
from svax.models import smm_baseline
from svax.pgm import gmm, natgrad, smm


def make_nat(rng, k, d):
    from svax.expfam import niw

    m = rng.standard_normal((k, d))
    kappa = rng.uniform(0.5, 2.0, k)
    a = rng.standard_normal((k, d, d))
    phi = np.einsum("kij,klj->kil", a, a) + d * np.eye(d)
    nu = rng.uniform(d + 1.5, d + 5.0, k)
    alpha = rng.uniform(0.5, 4.0, k)
    return gmm.GmmNat(
        dir_nat=jnp.asarray(alpha - 1.0),
        niw_nat=niw.standard_to_natural(
            niw.NiwStandard(jnp.asarray(m), jnp.asarray(kappa), jnp.asarray(phi), jnp.asarray(nu))
        ),
    )


def test_e_step_vs_brute_force(rng):
    k, d, n, dof = 3, 2, 15, 5.0
    nat = make_nat(rng, k, d)
    exp = gmm.expected_params(nat)
    x = rng.standard_normal((n, d))
    resp, e_u, evidence = smm.e_step_obs(jnp.asarray(x), exp, dof)

    a0 = b0 = dof / 2.0
    a = a0 + d / 2.0
    log_rho = np.zeros((n, k))
    for j in range(k):
        for i in range(n):
            quad = (
                x[i] @ np.asarray(exp.prec)[j] @ x[i]
                - 2 * x[i] @ np.asarray(exp.prec_mean)[j]
                + float(exp.quad[j])
            )
            b = b0 + 0.5 * quad
            log_rho[i, j] = (
                float(exp.log_pi[j])
                + 0.5 * float(exp.logdet[j])
                - d / 2 * np.log(2 * np.pi)
                + a0 * np.log(b0)
                + sp_gammaln(a)
                - sp_gammaln(a0)
                - a * np.log(b)
            )
    want_ev = np.log(np.exp(log_rho).sum(-1))
    np.testing.assert_allclose(np.asarray(evidence), want_ev, rtol=1e-8)
    want_r = np.exp(log_rho - want_ev[:, None])
    np.testing.assert_allclose(np.asarray(resp), want_r, rtol=1e-7, atol=1e-10)


def test_gmm_limit_at_large_dof(rng):
    """As dof → ∞ the SMM E-step and stats reduce to the GMM's."""
    k, d, n = 4, 2, 30
    nat = make_nat(rng, k, d)
    exp = gmm.expected_params(nat)
    x = jnp.asarray(rng.standard_normal((n, d)))
    resp_g, ev_g = gmm.e_step_obs(x, exp)
    resp_s, e_u, ev_s = smm.e_step_obs(x, exp, dof=1e7)
    np.testing.assert_allclose(np.asarray(resp_s), np.asarray(resp_g), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e_u), 1.0, rtol=1e-4)
    stats_s = smm.suff_stats_obs(x, resp_s, e_u)
    stats_g = gmm.suff_stats_obs(x, resp_g)
    np.testing.assert_allclose(np.asarray(stats_s.counts), np.asarray(stats_g.counts), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats_s.scatter_stat), np.asarray(stats_g.scatter_stat), rtol=1e-3)


def test_smm_elbo_monotone_and_converges():
    x_np = make_pinwheel_data(num_classes=5, num_per_class=40, seed=1)
    # Inject gross outliers — the t-mixture should absorb them gracefully.
    out = np.random.default_rng(0).standard_normal((12, 2)) * 40.0
    x = jnp.asarray(np.concatenate([x_np, out]))
    k = 8
    prior = gmm.make_prior(k, 2, dtype=jnp.float64)
    state = smm_baseline.init_state(jax.random.PRNGKey(2), prior, x)
    step = jax.jit(smm_baseline.make_train_step(prior, 1.0, num_total=x.shape[0], dof=4.0))
    elbos = []
    for _ in range(40):
        state, metrics = step(state, x)
        elbos.append(float(metrics["elbo"]))
    diffs = np.diff(elbos)
    assert np.all(diffs > -1e-6), f"SMM ELBO decreased: {diffs.min()}"
    assert elbos[-1] > elbos[0] + 10.0


def test_smm_robust_vs_gmm_on_outliers():
    """With heavy outliers, the SMM's inlier clusters stay tighter than the
    GMM's: compare the max component E[Σ] trace restricted to inlier-heavy
    components."""
    from svax.expfam import niw as niw_mod
    from svax.models import gmm_baseline

    x_in = make_pinwheel_data(num_classes=3, num_per_class=50, seed=3)
    out = np.random.default_rng(1).standard_normal((10, 2)) * 60.0
    x = jnp.asarray(np.concatenate([x_in, out]))
    prior = gmm.make_prior(6, 2, dtype=jnp.float64)
    key = jax.random.PRNGKey(4)

    sstate = smm_baseline.init_state(key, prior, x)
    sstep = jax.jit(smm_baseline.make_train_step(prior, 1.0, x.shape[0], dof=3.0))
    gstate = gmm_baseline.init_state(key, prior, x)
    gstep = jax.jit(gmm_baseline.make_train_step(prior, 1.0, x.shape[0]))
    for _ in range(35):
        sstate, _ = sstep(sstate, x)
        gstate, _ = gstep(gstate, x)

    def med_cov_trace(nat):
        std = niw_mod.natural_to_standard(nat.niw_nat)
        cov = np.asarray(std.phi) / np.maximum(np.asarray(std.nu)[:, None, None] - 3.0, 0.5)
        return np.median(np.trace(cov, axis1=-2, axis2=-1))

    assert med_cov_trace(sstate.nat) <= med_cov_trace(gstate.nat) * 1.5
