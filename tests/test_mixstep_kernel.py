"""Mixture-step megakernel vs the XLA GMM/SMM train steps.

Runs svax/ops/mixstep_pallas.py through the Pallas interpreter on CPU and
compares the naturals trajectory and per-step metrics against explicit
loops of ``gmm_baseline.make_train_step`` / ``smm_baseline.make_train_step``
— the same oracle pattern as tests/test_tinystep_kernel.py.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from svax.data import make_pinwheel_data
from svax.models import gmm_baseline, smm_baseline
from svax.ops import mixstep_pallas as msp
from svax.pgm import gmm

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _setup(n, k, seed=0):
    x = jnp.asarray(
        make_pinwheel_data(num_classes=5, num_per_class=-(-n // 5),
                           seed=seed)[:n]
    ).astype(jnp.float32)
    prior = jax.tree.map(
        lambda a: a.astype(jnp.float32), gmm.make_prior(k, 2, kappa=0.05)
    )
    state = gmm_baseline.init_state(jax.random.PRNGKey(seed), prior, x)
    return x, prior, state


def _oracle(step_fn, state, x, t_steps):
    evid = []
    for _ in range(t_steps):
        state, mets = step_fn(state, x)
        evid.append(float(mets["local_evidence"]))
    return state, np.asarray(evid)


def _assert_nat_close(a, b, rtol=3e-4, atol=3e-4):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(la, np.float64), np.asarray(lb, np.float64),
            rtol=rtol, atol=atol,
        )


def test_gmm_trajectory_matches_oracle():
    x, prior, state = _setup(n=72, k=5)
    t = 6
    oracle_step = gmm_baseline.make_train_step(prior, rho=0.3, num_total=72)
    ref_state, ref_evid = _oracle(oracle_step, state, x, t)

    new_state, mets = msp.train_chunk(
        state, prior, x, rho=0.3, t_steps=t, interpret=True
    )
    _assert_nat_close(new_state.nat, ref_state.nat)
    np.testing.assert_allclose(
        np.asarray(mets["local_evidence"]), ref_evid, rtol=2e-4, atol=2e-3
    )
    assert int(new_state.step) == t


def test_gmm_conjugate_rho_one():
    x, prior, state = _setup(n=64, k=4, seed=1)
    oracle_step = gmm_baseline.make_train_step(prior, rho=1.0, num_total=64)
    ref_state, _ = _oracle(oracle_step, state, x, 3)
    new_state, _ = msp.train_chunk(
        state, prior, x, rho=1.0, t_steps=3, interpret=True
    )
    _assert_nat_close(new_state.nat, ref_state.nat)


def test_gmm_minibatch_scale_num_total():
    # scale = num_total / n applies to stats AND the evidence metric.
    x, prior, state = _setup(n=72, k=5, seed=2)
    oracle_step = gmm_baseline.make_train_step(prior, rho=0.4, num_total=144)
    ref_state, ref_evid = _oracle(oracle_step, state, x, 4)
    new_state, mets = msp.train_chunk(
        state, prior, x, rho=0.4, t_steps=4, num_total=144, interpret=True
    )
    _assert_nat_close(new_state.nat, ref_state.nat)
    np.testing.assert_allclose(
        np.asarray(mets["local_evidence"]), ref_evid, rtol=2e-4, atol=4e-3
    )


def test_gmm_nonaligned_n_padding():
    # N=130 pads to 256 lanes; padded columns must not leak into stats.
    x, prior, state = _setup(n=130, k=10, seed=3)
    oracle_step = gmm_baseline.make_train_step(prior, rho=0.5, num_total=130)
    ref_state, _ = _oracle(oracle_step, state, x, 3)
    new_state, _ = msp.train_chunk(
        state, prior, x, rho=0.5, t_steps=3, interpret=True
    )
    _assert_nat_close(new_state.nat, ref_state.nat)


def test_smm_trajectory_matches_oracle():
    x, prior, state0 = _setup(n=72, k=5, seed=4)
    state = smm_baseline.init_state(jax.random.PRNGKey(4), prior, x)
    del state0
    t = 5
    oracle_step = smm_baseline.make_train_step(
        prior, rho=0.3, num_total=72, dof=4.0
    )
    ref_state, ref_evid = _oracle(oracle_step, state, x, t)
    new_state, mets = msp.train_chunk(
        state, prior, x, rho=0.3, t_steps=t, dof=4.0, interpret=True
    )
    _assert_nat_close(new_state.nat, ref_state.nat)
    np.testing.assert_allclose(
        np.asarray(mets["local_evidence"]), ref_evid, rtol=2e-4, atol=2e-3
    )


def test_unroll_grid_mix_matches_oracle():
    # grid > 1 AND unroll > 1 together: t=12 at unroll=3 runs 4 grid
    # iterations of 3 in-register steps each. The trajectory and the
    # per-step evidence metric must match the step-at-a-time oracle, and
    # the naturals must agree across unroll factors to float-scheduling
    # noise (same math; the compiler may fuse the unrolled body
    # differently, so the last bits can differ — measured ~1e-6 rel).
    x, prior, state = _setup(n=72, k=5, seed=6)
    t = 12
    oracle_step = gmm_baseline.make_train_step(prior, rho=0.3, num_total=72)
    ref_state, ref_evid = _oracle(oracle_step, state, x, t)

    st3, mets3 = msp.train_chunk(
        state, prior, x, rho=0.3, t_steps=t, interpret=True, unroll=3
    )
    _assert_nat_close(st3.nat, ref_state.nat)
    np.testing.assert_allclose(
        np.asarray(mets3["local_evidence"]), ref_evid, rtol=2e-4, atol=2e-3
    )
    assert int(st3.step) == t

    st1, _ = msp.train_chunk(
        state, prior, x, rho=0.3, t_steps=t, interpret=True, unroll=1
    )
    for la, lb in zip(jax.tree.leaves(st1.nat), jax.tree.leaves(st3.nat)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5
        )

    # a non-divisor request clamps to the largest divisor (5 → 4 at t=12)
    st5, _ = msp.train_chunk(
        state, prior, x, rho=0.3, t_steps=t, interpret=True, unroll=5
    )
    _assert_nat_close(st5.nat, ref_state.nat)


def test_smm_reduces_to_gmm_at_large_dof():
    # dof large enough that E[u] ≈ 1, small enough that f32 keeps the
    # ½·quad term alive inside a·log(a₀ + ½·quad): the residual GMM gap
    # is O(quad²/8a₀) plus a·ε_f32 of rounding — a few 1e-3 at dof=1e4.
    x, prior, state = _setup(n=64, k=4, seed=5)
    gmm_state, _ = msp.train_chunk(
        state, prior, x, rho=0.6, t_steps=2, dof=0.0, interpret=True
    )
    smm_state, _ = msp.train_chunk(
        state, prior, x, rho=0.6, t_steps=2, dof=1e4, interpret=True
    )
    _assert_nat_close(smm_state.nat, gmm_state.nat, rtol=0.03, atol=0.03)


def test_supported_gate():
    assert msp.supported(data_dim=2, batch_full=True, rho=0.1)
    assert not msp.supported(data_dim=3, batch_full=True, rho=0.1)
    assert not msp.supported(data_dim=2, batch_full=False, rho=0.1)
    assert not msp.supported(data_dim=2, batch_full=True,
                             rho=lambda t: 0.1)
