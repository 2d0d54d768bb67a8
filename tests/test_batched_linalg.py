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


def test_custom_vjps_match_autodiff_oracles(rng):
    """The analytic backwards (docs/DESIGN.md) equal autodiff of the raw
    unrolled recurrences — the compile-time/memory win must be free."""
    import jax

    d = 5
    a = random_psd(rng, (3,), d)
    A = jnp.asarray(a)
    b = jnp.asarray(rng.standard_normal((3, d)))
    Lb = jnp.asarray(rng.standard_normal((3, d, d)))
    yb = jnp.asarray(rng.standard_normal((3, d)))

    L, vjp_new = jax.vjp(bl.cholesky, A)
    _, vjp_old = jax.vjp(bl._cholesky_unrolled, A)
    np.testing.assert_allclose(
        np.asarray(vjp_new(Lb)[0]), np.asarray(vjp_old(Lb)[0]), rtol=1e-9, atol=1e-12
    )

    def tril_raw(c, bb):
        y = []
        for i in range(d):
            s = bb[..., i]
            for k in range(i):
                s = s - c[..., i, k] * y[k]
            y.append(s / c[..., i, i])
        return jnp.stack(y, axis=-1)

    def triu_raw(c, bb):
        x = [None] * d
        for i in reversed(range(d)):
            s = bb[..., i]
            for k in range(i + 1, d):
                s = s - c[..., k, i] * x[k]
            x[i] = s / c[..., i, i]
        return jnp.stack(x, axis=-1)

    for fn, raw in [(bl.solve_tril_vec, tril_raw), (bl.solve_triu_vec, triu_raw)]:
        out1, v1 = jax.vjp(fn, L, b)
        out2, v2 = jax.vjp(raw, L, b)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-12)
        g1, g2 = v1(yb), v2(yb)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-9, atol=1e-12)
