"""L1 GMM engine tests: brute-force oracle, VBEM fixed point, monotone ELBO."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import digamma as sp_digamma

from svax.data import make_pinwheel_data
from svax.expfam import niw
from svax.pgm import gmm, natgrad


def brute_force_log_resp(x, alpha, m, kappa, phi, nu):
    """Numpy reimplementation of §4.2's E-step, one (n, k) at a time."""
    n, d = x.shape
    k = len(alpha)
    out = np.zeros((n, k))
    elogpi = sp_digamma(alpha) - sp_digamma(alpha.sum())
    for j in range(k):
        phi_inv = np.linalg.inv(phi[j])
        elam = nu[j] * phi_inv
        elogdet = (
            sum(sp_digamma((nu[j] + 1 - i) / 2.0) for i in range(1, d + 1))
            + d * np.log(2.0)
            - np.linalg.slogdet(phi[j])[1]
        )
        equad = d / kappa[j] + nu[j] * m[j] @ phi_inv @ m[j]
        for i in range(n):
            quad = x[i] @ elam @ x[i] - 2 * x[i] @ (elam @ m[j]) + equad
            out[i, j] = elogpi[j] + 0.5 * elogdet - 0.5 * quad - d / 2 * np.log(2 * np.pi)
    return out


def make_nat(rng, k, d):
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
    ), (alpha, m, kappa, phi, nu)


def test_e_step_vs_brute_force(rng):
    k, d, n = 4, 3, 20
    nat, (alpha, m, kappa, phi, nu) = make_nat(rng, k, d)
    x = rng.standard_normal((n, d))
    exp = gmm.expected_params(nat)
    log_rho = np.asarray(gmm.log_responsibilities_obs(jnp.asarray(x), exp))
    want = brute_force_log_resp(x, alpha, m, kappa, phi, nu)
    np.testing.assert_allclose(log_rho, want, rtol=1e-8, atol=1e-8)


def test_rho_one_full_batch_is_exact_conjugate_posterior(rng):
    """With ρ=1 and full batch, CVI lands on η₀ + full-batch stats (§9.5)."""
    k, d, n = 3, 2, 40
    x = rng.standard_normal((n, d))
    prior = gmm.make_prior(k, d, dtype=jnp.float64)
    nat = gmm.init_variational(jax.random.PRNGKey(0), prior, jnp.asarray(x))
    exp = gmm.expected_params(nat)
    resp, _ = gmm.e_step_obs(jnp.asarray(x), exp)
    stats = gmm.suff_stats_obs(jnp.asarray(x), resp, scale=1.0)
    inc = gmm.stats_to_nat(stats)
    new = natgrad.cvi_update(nat, prior, inc, rho=1.0)
    want = jax.tree.map(jnp.add, prior, inc)
    for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_vbem_elbo_monotone():
    """Full-batch ρ=1 CVI is VBEM coordinate ascent → ELBO never decreases."""
    x = jnp.asarray(make_pinwheel_data(num_classes=5, num_per_class=40, seed=1))
    k = 8
    prior = gmm.make_prior(k, 2, kappa=0.05, psi_scale=1.0, dtype=jnp.float64)
    nat = gmm.init_variational(jax.random.PRNGKey(2), prior, x, pseudo_counts=2.0)

    @jax.jit
    def step(nat):
        exp = gmm.expected_params(nat)
        resp, _ = gmm.e_step_obs(x, exp)
        inc = gmm.stats_to_nat(gmm.suff_stats_obs(x, resp))
        new = natgrad.cvi_update(nat, prior, inc, rho=1.0)
        elbo, _ = gmm.elbo_obs(x, new, prior)
        return new, elbo

    elbos = []
    for _ in range(30):
        nat, e = step(nat)
        elbos.append(float(e))
    diffs = np.diff(np.array(elbos))
    assert np.all(diffs > -1e-7), f"ELBO decreased: {diffs.min()}"
    assert elbos[-1] > elbos[0] + 10.0


def test_pinwheel_recovery():
    """GMM on pinwheel finds ≥ num_classes effective clusters (SURVEY §5)."""
    x = jnp.asarray(make_pinwheel_data(num_classes=5, num_per_class=60, seed=3))
    k = 10
    prior = gmm.make_prior(k, 2, alpha=0.5, kappa=0.05, psi_scale=1.0, dtype=jnp.float64)
    nat = gmm.init_variational(jax.random.PRNGKey(4), prior, x, pseudo_counts=2.0)

    @jax.jit
    def step(nat):
        exp = gmm.expected_params(nat)
        resp, _ = gmm.e_step_obs(x, exp)
        inc = gmm.stats_to_nat(gmm.suff_stats_obs(x, resp))
        return natgrad.cvi_update(nat, prior, inc, rho=1.0)

    for _ in range(80):
        nat = step(nat)
    exp = gmm.expected_params(nat)
    resp, _ = gmm.e_step_obs(x, exp)
    counts = np.asarray(resp.sum(0))
    effective = int((counts > len(x) * 0.02).sum())
    assert effective >= 5, f"only {effective} effective clusters, counts={counts}"


def test_cvi_optax_transform_matches_function(rng):
    k, d, n = 3, 2, 25
    x = jnp.asarray(rng.standard_normal((n, d)))
    prior = gmm.make_prior(k, d, dtype=jnp.float64)
    nat = gmm.init_variational(jax.random.PRNGKey(0), prior, x)
    exp = gmm.expected_params(nat)
    resp, _ = gmm.e_step_obs(x, exp)
    inc = gmm.stats_to_nat(gmm.suff_stats_obs(x, resp, scale=4.0))
    rho = 0.3
    want = natgrad.cvi_update(nat, prior, inc, rho)
    opt = natgrad.cvi(prior, rho)
    state = opt.init(nat)
    updates, _ = opt.update(inc, state, nat)
    got = jax.tree.map(jnp.add, nat, updates)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_suff_stats_from_moments_matches_obs(rng):
    """Observed-data stats are the moments path with ez=x, ezz=xxᵀ."""
    n, k, d = 12, 3, 2
    x = jnp.asarray(rng.standard_normal((n, d)))
    resp = jax.nn.softmax(jnp.asarray(rng.standard_normal((n, k))), axis=-1)
    a = gmm.suff_stats_obs(x, resp, scale=2.0)
    ez = jnp.broadcast_to(x[:, None, :], (n, k, d))
    ezz = jnp.broadcast_to((x[:, :, None] * x[:, None, :])[:, None], (n, k, d, d))
    b = gmm.suff_stats_from_moments(resp, ez, ezz, scale=2.0)
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-10)
