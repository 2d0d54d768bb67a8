"""k-means++ init and cluster-purity metric."""

import jax
import jax.numpy as jnp
import numpy as np

from svax.data import make_pinwheel_data
from svax.models import evaluation, gmm_baseline
from svax.pgm import gmm
from svax.pgm.init import init_variational_kmeanspp, kmeanspp_centers


def test_kmeanspp_centers_spread():
    x, labels = make_pinwheel_data(num_classes=5, num_per_class=50, seed=0, return_labels=True)
    centers = kmeanspp_centers(x, 5, seed=1)
    assert centers.shape == (5, 2)
    # D² sampling should land centers in ≥ 4 distinct true arms.
    d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
    owning_arm = labels[d.argmin(0)]
    assert len(np.unique(owning_arm)) >= 4


def test_kmeanspp_init_is_valid_niw():
    from svax.expfam import niw

    x = make_pinwheel_data(num_classes=4, num_per_class=30, seed=1)
    prior = gmm.make_prior(6, 2, dtype=jnp.float64)
    nat = init_variational_kmeanspp(prior, x, seed=0)
    std = niw.natural_to_standard(nat.niw_nat)
    chol = np.linalg.cholesky(np.asarray(std.phi))  # raises if not PD
    assert np.all(np.isfinite(chol))
    assert np.all(np.asarray(std.nu) > 1.0)


def test_purity_improves_with_training_and_kmeanspp():
    x_np, labels = make_pinwheel_data(
        num_classes=5, num_per_class=60, seed=2, return_labels=True
    )
    x = jnp.asarray(x_np)
    prior = gmm.make_prior(10, 2, alpha=0.5, dtype=jnp.float64)
    nat = init_variational_kmeanspp(prior, x_np, seed=0)
    state = gmm_baseline.GmmTrainState(nat=nat, step=jnp.zeros((), jnp.int32))
    step = jax.jit(gmm_baseline.make_train_step(prior, 1.0, num_total=x.shape[0]))
    for _ in range(60):
        state, _ = step(state, x)
    resp, _ = gmm.e_step_obs(x, gmm.expected_params(state.nat))
    purity = evaluation.cluster_purity(resp, labels)
    assert purity > 0.9, purity


def test_purity_bounds():
    resp = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    labels = np.array([0, 0, 1, 1])
    assert evaluation.cluster_purity(resp, labels) == 1.0
    labels_bad = np.array([0, 1, 0, 1])
    assert evaluation.cluster_purity(resp, labels_bad) == 0.5
