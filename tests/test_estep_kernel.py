"""Fused E-step kernel vs brute-force path (SURVEY.md §5 kernel tests).

On the CPU test backend the Pallas TPU kernel itself cannot compile, so we
verify (a) the reference twin ``e_step_stats_reference`` — the exact program
the kernel implements — against the L1 einsum path, and (b) the public
``e_step_stats_fused`` entry point, which falls back to the twin off-TPU.
The on-TPU kernel-vs-twin equivalence runs in benchmarks/ on real hardware.
"""

import pytest
import jax.numpy as jnp
import numpy as np

from svax.data import make_pinwheel_data
from svax.ops import estep_pallas
from svax.pgm import gmm

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _setup(seed=0, n=100, k=7, d=2):
    import jax

    x = jnp.asarray(
        make_pinwheel_data(num_classes=5, num_per_class=n // 5, seed=seed)[:, :2]
    )
    if d != 2:
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((n, d)))
    prior = gmm.make_prior(k, d, dtype=jnp.float64)
    nat = gmm.init_variational(jax.random.PRNGKey(seed), prior, x)
    return x, gmm.expected_params(nat)


def test_reference_twin_matches_einsum_path():
    x, exp = _setup()
    resp, evidence = gmm.e_step_obs(x, exp)
    want = gmm.suff_stats_obs(x, resp, scale=3.0)
    got, ev = estep_pallas.e_step_stats_reference(x, exp, scale=3.0)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(evidence), rtol=1e-10)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-9)


def test_reference_twin_higher_dim():
    x, exp = _setup(seed=1, n=64, k=5, d=6)
    resp, evidence = gmm.e_step_obs(x, exp)
    want = gmm.suff_stats_obs(x, resp, scale=1.0)
    got, ev = estep_pallas.e_step_stats_reference(x, exp)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(evidence), rtol=1e-9)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9)


def test_fused_entry_point_fallback():
    """Off-TPU the public entry point routes to the twin — same results."""
    x, exp = _setup(seed=2)
    got, ev = estep_pallas.e_step_stats_fused(x, exp, scale=2.0)
    want, ev_want = estep_pallas.e_step_stats_reference(x, exp, scale=2.0)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_want), rtol=1e-8)


def test_pack_unpack_roundtrip():
    _, exp = _setup(seed=3, k=4)
    w = estep_pallas.pack_coeffs(exp, dtype=jnp.float64)
    d = exp.prec_mean.shape[1]
    assert w.shape == (1 + d + d * d, 4)
    # Unpack of Φᵀ R with R = identity-ish sanity: counts row is ones·R.
    stats = np.zeros((1 + d + d * d, 4))
    stats[0] = [1.0, 2.0, 3.0, 4.0]
    out = estep_pallas.unpack_stats(jnp.asarray(stats), d)
    np.testing.assert_allclose(np.asarray(out.counts), stats[0])
