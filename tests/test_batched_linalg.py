"""Unrolled small-d linalg vs numpy oracles (SURVEY.md §5, kernel tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svax.ops import batched_linalg as bl


def random_psd(rng, batch, d):
    a = rng.standard_normal(batch + (d, d))
    return np.einsum("...ij,...kj->...ik", a, a) + d * np.eye(d)


@pytest.mark.parametrize("d", [1, 2, 3, 5, 10])
def test_cholesky_matches_numpy(rng, d):
    a = random_psd(rng, (7, 3), d)
    chol = np.asarray(bl.cholesky(jnp.asarray(a)))
    np.testing.assert_allclose(chol, np.linalg.cholesky(a), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("d", [1, 2, 4, 8])
def test_cho_solve_vec(rng, d):
    a = random_psd(rng, (5,), d)
    b = rng.standard_normal((5, d))
    chol = bl.cholesky(jnp.asarray(a))
    x = np.asarray(bl.cho_solve_vec(chol, jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("...ij,...j->...i", a, x), b, rtol=1e-9, atol=1e-9)


def test_triangular_solves_roundtrip(rng):
    d = 6
    a = random_psd(rng, (4,), d)
    chol = bl.cholesky(jnp.asarray(a))
    b = rng.standard_normal((4, d))
    y = bl.solve_tril_vec(chol, jnp.asarray(b))
    np.testing.assert_allclose(
        np.einsum("...ij,...j->...i", np.asarray(chol), np.asarray(y)), b, rtol=1e-9, atol=1e-9
    )
    x = bl.solve_triu_vec(chol, jnp.asarray(b))
    lt = np.swapaxes(np.asarray(chol), -1, -2)
    np.testing.assert_allclose(
        np.einsum("...ij,...j->...i", lt, np.asarray(x)), b, rtol=1e-9, atol=1e-9
    )


def test_inv_and_logdet(rng):
    d = 4
    a = random_psd(rng, (6,), d)
    chol = bl.cholesky(jnp.asarray(a))
    inv = np.asarray(bl.inv_psd(chol))
    np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=1e-8, atol=1e-8)
    ld = np.asarray(bl.logdet_from_chol(chol))
    np.testing.assert_allclose(ld, np.linalg.slogdet(a)[1], rtol=1e-10)


def test_jitter():
    a = jnp.zeros((2, 3, 3))
    j = bl.add_jitter(a, 0.5)
    np.testing.assert_allclose(np.asarray(j[0]), 0.5 * np.eye(3))
