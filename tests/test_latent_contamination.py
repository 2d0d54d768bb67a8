"""Online-CVI robustness: the SMM update rule under latent contamination.

Library-level mirror of experiments/latent_contamination_demo.py (SURVEY
§3a SMM row's value case): with a FIXED feature map, CVI-only online
updates on a contaminated stream corrupt the mixture less under the
Student-t (u-weighted) update rule than under the plain GMM rule, and the
two rules agree on a clean stream (no robustness tax).

The "frozen encoder" is the identity-potential map pot_h = P·x, pot_p = P
(an encoder Gaussian centered at the point), so the latent space IS the
data space and `evaluation.gmm_predictive_log_prob` scores the adapted
naturals exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svax.models import evaluation, svae, svae_smm
from svax.pgm import gmm, natgrad, smm

K, D = 4, 2
RHO = 0.1
DOF = 4.0
POT_P = 4.0


def _clean_batch(rng, n):
    centers = np.array([[-3.0, 0.0], [3.0, 0.0], [0.0, 3.0], [0.0, -3.0]])
    idx = rng.integers(0, len(centers), size=n)
    return centers[idx] + 0.4 * rng.standard_normal((n, 2))


def _potentials(x):
    x = jnp.asarray(x, jnp.float32)
    return POT_P * x, POT_P * jnp.ones_like(x)


def _gmm_rule(nat, prior, xb, scale):
    pot_h, pot_p = _potentials(xb)
    exp = gmm.expected_params(nat)
    post = svae.sin_combine(pot_h, pot_p, exp)
    resp = jnp.exp(post.log_resp)
    ezz = post.cov + post.mean[..., :, None] * post.mean[..., None, :]
    stats = gmm.suff_stats_from_moments(resp, post.mean, ezz, scale)
    return natgrad.cvi_update(nat, prior, gmm.stats_to_nat(stats), RHO)


def _smm_rule(nat, prior, xb, scale):
    pot_h, pot_p = _potentials(xb)
    exp = gmm.expected_params(nat)
    post, _ = svae_smm.smm_combine(pot_h, pot_p, exp, DOF, 2)
    stats = svae_smm.suff_stats_latent(post, scale)
    return natgrad.cvi_update(nat, prior, smm.stats_to_nat(stats), RHO)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n = 96
    prior = jax.tree.map(
        lambda a: a.astype(jnp.float32), gmm.make_prior(K, D, kappa=0.05)
    )
    x0 = _clean_batch(rng, n)
    nat = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        gmm.init_variational(jax.random.PRNGKey(0), prior, jnp.asarray(x0)),
    )
    # Warm-fit on clean batches (GMM rule) to a sensible mixture.
    fit = jax.jit(lambda nat, xb: _gmm_rule(nat, prior, xb, 1.0))
    for t in range(60):
        nat = fit(nat, jnp.asarray(_clean_batch(rng, n), jnp.float32))
    eval_x = jnp.asarray(_clean_batch(rng, 256), jnp.float32)

    # Diffuse box outliers — the regime the Student-t prior protects
    # against (it downweights points far from EVERY component). A
    # persistent tight far cluster is different: both rules legitimately
    # capture it with a spare component (it IS structure), and under
    # saturating contamination (100+ steps, ≥1/3 fraction) both rules
    # reach the same corrupted equilibrium where E[u] ≈ 1 near the
    # drifted components — measured while building this test. The SMM
    # advantage is strongest while outliers remain far from all
    # components, which is the 40-step window asserted here (and the
    # end-to-end frozen-encoder version in
    # experiments/latent_contamination_demo.py: +0.15 nats at 500 steps).
    clean = np.stack([_clean_batch(rng, n) for _ in range(40)])
    contam = clean.copy()
    contam[:, : n // 4, :] = rng.uniform(-30, 30, size=(40, n // 4, 2))
    return prior, nat, eval_x, jnp.asarray(clean, jnp.float32), jnp.asarray(
        contam, jnp.float32
    )


def _run(rule, prior, nat0, stream):
    def body(nat, xb):
        return rule(nat, prior, xb, 1.0), None

    return jax.jit(lambda n0, s: jax.lax.scan(body, n0, s)[0])(nat0, stream)


def _score(nat, eval_x):
    return float(jnp.mean(evaluation.gmm_predictive_log_prob(nat, eval_x)))


def test_smm_rule_resists_latent_contamination(setup):
    prior, nat0, eval_x, clean, contam = setup
    base = _score(nat0, eval_x)
    s_gmm = _score(_run(_gmm_rule, prior, nat0, contam), eval_x)
    s_smm = _score(_run(_smm_rule, prior, nat0, contam), eval_x)
    # The GMM rule must actually be corrupted for the test to mean
    # anything; the SMM rule must hold clean-eval density better.
    assert s_gmm < base - 0.05, (s_gmm, base)
    assert s_smm > s_gmm + 0.02, (s_smm, s_gmm)


def test_no_robustness_tax_on_clean_stream(setup):
    prior, nat0, eval_x, clean, contam = setup
    s_gmm = _score(_run(_gmm_rule, prior, nat0, clean), eval_x)
    s_smm = _score(_run(_smm_rule, prior, nat0, clean), eval_x)
    assert abs(s_smm - s_gmm) < 0.1, (s_smm, s_gmm)


def test_outliers_downweighted(setup):
    prior, nat0, eval_x, clean, contam = setup
    xb = contam[0]
    pot_h, pot_p = _potentials(xb)
    exp = gmm.expected_params(nat0)
    post, _ = svae_smm.smm_combine(pot_h, pot_p, exp, DOF, 2)
    resp = jnp.exp(post.log_resp)
    e_u = jnp.sum(resp * post.e_u, axis=-1)
    n_out = xb.shape[0] // 4
    assert float(jnp.mean(e_u[:n_out])) < 0.5 * float(
        jnp.mean(e_u[n_out:])
    )
