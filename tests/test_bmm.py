"""Beta expfam + Bernoulli-mixture engine: oracles, identities, recovery.

Mirrors tests/test_gmm.py's strategy (SURVEY.md §5) for the Beta–Bernoulli
conjugate pair: scipy oracles for the expected stats, the
grad-of-log-partition identity, a brute-force numpy E-step, the ρ=1
full-batch conjugate fixed point, template recovery, exact-predictive
correctness (enumeration + leave-one-in conjugate oracle), and the
DP psum == full-batch contract through shard_map.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import digamma as sp_digamma
from scipy.stats import beta as sp_beta

from svax.expfam import beta
from svax.models import bmm_baseline
from svax.pgm import bmm, natgrad


# ------------------------------------------------------------ Beta expfam


def test_beta_roundtrip_and_scipy_oracle(rng):
    ab = jnp.asarray(rng.uniform(0.3, 5.0, (7, 2)))
    np.testing.assert_allclose(
        np.asarray(beta.natural_to_standard(beta.standard_to_natural(ab))),
        np.asarray(ab), rtol=1e-12,
    )
    elog = np.asarray(beta.expected_log_theta(ab))
    a, b = np.asarray(ab[:, 0]), np.asarray(ab[:, 1])
    np.testing.assert_allclose(elog[:, 0], sp_digamma(a) - sp_digamma(a + b),
                               rtol=1e-10)
    np.testing.assert_allclose(elog[:, 1], sp_digamma(b) - sp_digamma(a + b),
                               rtol=1e-10)
    # E[θ] and log-prob against scipy.
    np.testing.assert_allclose(np.asarray(beta.mean(ab)), a / (a + b),
                               rtol=1e-12)
    theta = rng.uniform(0.05, 0.95, 7)
    np.testing.assert_allclose(
        np.asarray(beta.log_prob(ab, jnp.asarray(theta))),
        sp_beta.logpdf(theta, a, b), rtol=1e-9, atol=1e-9,
    )


def test_beta_log_partition_gradient_identity(rng):
    """∇_η A(η) = (E[log θ], E[log(1−θ)]) — the exp-family identity."""
    ab = jnp.asarray(rng.uniform(0.4, 4.0, (5, 2)))
    nat = beta.standard_to_natural(ab)
    grad = jax.vmap(jax.grad(beta.log_partition_nat))(nat)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(beta.expected_log_theta(ab)), rtol=1e-9
    )


def test_beta_kl_properties_and_monte_carlo(rng):
    ab_q = jnp.asarray(rng.uniform(0.5, 4.0, (6, 2)))
    ab_p = jnp.asarray(rng.uniform(0.5, 4.0, (6, 2)))
    kl = np.asarray(beta.kl(ab_q, ab_p))
    assert np.all(kl >= -1e-12)
    np.testing.assert_allclose(np.asarray(beta.kl(ab_q, ab_q)), 0.0,
                               atol=1e-10)
    # MC check on the first row.
    a, b = float(ab_q[0, 0]), float(ab_q[0, 1])
    draws = sp_beta.rvs(a, b, size=200_000,
                        random_state=np.random.default_rng(0))
    mc = np.mean(
        sp_beta.logpdf(draws, a, b)
        - sp_beta.logpdf(draws, float(ab_p[0, 0]), float(ab_p[0, 1]))
    )
    np.testing.assert_allclose(kl[0], mc, rtol=0.05, atol=0.01)


# ------------------------------------------------------ mixture engine


def _brute_force_log_resp(x, alpha, ab):
    n, d = x.shape
    k = len(alpha)
    out = np.zeros((n, k))
    elogpi = sp_digamma(alpha) - sp_digamma(alpha.sum())
    for j in range(k):
        et = sp_digamma(ab[j, :, 0]) - sp_digamma(ab[j].sum(-1))
        e1mt = sp_digamma(ab[j, :, 1]) - sp_digamma(ab[j].sum(-1))
        for i in range(n):
            out[i, j] = elogpi[j] + np.sum(x[i] * et + (1 - x[i]) * e1mt)
    return out


def _rand_nat(rng, k, d):
    alpha = rng.uniform(0.5, 4.0, k)
    ab = rng.uniform(0.4, 5.0, (k, d, 2))
    return bmm.BmmNat(
        dir_nat=jnp.asarray(alpha - 1.0),
        beta_nat=jnp.asarray(ab - 1.0),
    ), (alpha, ab)


def test_bmm_e_step_vs_brute_force(rng):
    k, d, n = 4, 6, 25
    nat, (alpha, ab) = _rand_nat(rng, k, d)
    x = (rng.uniform(size=(n, d)) < 0.5).astype(np.float64)
    exp = bmm.expected_params(nat)
    log_rho = np.asarray(bmm.log_responsibilities(jnp.asarray(x), exp))
    np.testing.assert_allclose(log_rho, _brute_force_log_resp(x, alpha, ab),
                               rtol=1e-9, atol=1e-9)
    resp, evidence = bmm.e_step(jnp.asarray(x), exp)
    np.testing.assert_allclose(np.asarray(resp).sum(-1), 1.0, rtol=1e-10)
    want_ev = np.log(np.exp(log_rho).sum(-1))
    np.testing.assert_allclose(np.asarray(evidence), want_ev, rtol=1e-9)


def test_bmm_rho_one_full_batch_is_exact_conjugate_posterior(rng):
    """ρ=1 + full batch: CVI lands on η₀ + full-batch stats (§9.5)."""
    k, d, n = 3, 5, 40
    prior = bmm.make_prior(k, d, alpha=1.5, beta_a=0.8, beta_b=1.2,
                           dtype=jnp.float64)
    x = jnp.asarray((rng.uniform(size=(n, d)) < 0.4).astype(np.float64))
    nat0 = bmm.init_variational(jax.random.PRNGKey(0), prior, x)
    exp = bmm.expected_params(nat0)
    resp, _ = bmm.e_step(x, exp)
    stats = bmm.suff_stats(x, resp, scale=1.0)
    new = natgrad.cvi_update(nat0, prior, bmm.stats_to_nat(stats), rho=1.0)
    # Exact conjugate posterior at these responsibilities.
    want_dir = np.asarray(prior.dir_nat) + np.asarray(resp).sum(0)
    np.testing.assert_allclose(np.asarray(new.dir_nat), want_dir, rtol=1e-12)
    s = np.asarray(resp).T @ np.asarray(x)
    counts = np.asarray(resp).sum(0)
    want_beta = np.asarray(prior.beta_nat) + np.stack(
        [s, counts[:, None] - s], axis=-1
    )
    np.testing.assert_allclose(np.asarray(new.beta_nat), want_beta,
                               rtol=1e-10, atol=1e-12)


def test_bmm_vbem_elbo_monotone_and_recovery():
    """Templates are recovered and the ρ=1 VBEM ELBO is monotone."""
    rng = np.random.default_rng(1)
    k_true, d, n_per = 3, 12, 120
    # Well-separated templates: each class is "on" over a distinct third
    # of the pixels (the MNIST-surrogate style of separability).
    templates = np.full((k_true, d), 0.1)
    for c in range(k_true):
        templates[c, c * 4:(c + 1) * 4] = 0.9
    labels = np.repeat(np.arange(k_true), n_per)
    x = (rng.uniform(size=(len(labels), d)) < templates[labels]).astype(
        np.float64
    )
    xj = jnp.asarray(x)
    prior = bmm.make_prior(4, d, dtype=jnp.float64)
    state = bmm_baseline.init_state(jax.random.PRNGKey(0), prior, xj)
    step = jax.jit(bmm_baseline.make_train_step(prior, 1.0, x.shape[0]))
    elbos = []
    for _ in range(60):
        state, m = step(state, xj)
        elbos.append(float(m["elbo"]))
    diffs = np.diff(np.asarray(elbos))
    assert np.all(diffs > -1e-6), "VBEM ELBO must be monotone"
    # Cluster purity: hard assignments recover the generating template.
    resp, _ = bmm.e_step(xj, bmm.expected_params(state.nat))
    hard = np.asarray(jnp.argmax(resp, -1))
    purity = sum(
        np.max(np.bincount(labels[hard == c])) for c in np.unique(hard)
    ) / len(labels)
    assert purity > 0.9, purity


def test_bmm_exact_predictive_vs_enumeration(rng):
    """The predictive integrates q exactly: match the brute-force
    enumeration of E_q[p(x*|π,θ)] via independent Beta/Dirichlet means."""
    k, d = 3, 4
    nat, (alpha, ab) = _rand_nat(rng, k, d)
    x = jnp.asarray((rng.uniform(size=(9, d)) < 0.5).astype(np.float64))
    got = np.asarray(bmm.predictive_log_prob(nat, x))
    w = alpha / alpha.sum()
    theta = ab[..., 0] / ab.sum(-1)
    want = np.zeros(9)
    for i in range(9):
        xi = np.asarray(x[i])
        per_k = (theta ** xi) * ((1 - theta) ** (1 - xi))
        want[i] = np.log(np.sum(w * np.prod(per_k, axis=-1)))
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # Total mass over all 2^d binary vectors is exactly 1.
    grid = jnp.asarray(
        np.array(np.meshgrid(*([[0.0, 1.0]] * d))).reshape(d, -1).T
    )
    mass = np.exp(np.asarray(bmm.predictive_log_prob(nat, grid))).sum()
    np.testing.assert_allclose(mass, 1.0, rtol=1e-9)


def test_bmm_dp_psum_equals_full_batch():
    """8-device shard_map stats psum == single-device full batch, bit-level
    (the SURVEY §3b DP contract, same as test_parallel for the GMM)."""
    from svax.parallel import mesh as pmesh

    rng = np.random.default_rng(3)
    n, d, k = 64, 6, 4
    x = jnp.asarray((rng.uniform(size=(n, d)) < 0.5).astype(np.float64))
    prior = bmm.make_prior(k, d, dtype=jnp.float64)
    state0 = bmm_baseline.init_state(jax.random.PRNGKey(0), prior, x)

    step_single = jax.jit(bmm_baseline.make_train_step(prior, 0.3, n))
    ref, ref_m = step_single(state0, x)

    mesh = pmesh.make_data_mesh()
    step_dp = pmesh.data_parallel_step(
        lambda st, xb, key: bmm_baseline.make_train_step(
            prior, 0.3, n, axis_name="data")(st, xb),
        mesh,
    )
    dp, dp_m = step_dp(state0, x, jax.random.PRNGKey(0))
    # psum's shard-wise summation order may differ from the fused
    # single-device reduction at the last ulp; 1e-12 relative in f64.
    np.testing.assert_allclose(np.asarray(ref.nat.dir_nat),
                               np.asarray(dp.nat.dir_nat), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ref.nat.beta_nat),
                               np.asarray(dp.nat.beta_nat), rtol=1e-12)
    np.testing.assert_allclose(float(ref_m["elbo"]), float(dp_m["elbo"]),
                               rtol=1e-12)
