"""Unrolled small-d batched PSD linear algebra (TPU-first).

Everything here operates on arrays whose *trailing* one or two axes are the
tiny latent dimension ``d`` and whose leading axes are an arbitrarily large
batch (K components, or N×K posterior combines). For ``d <= UNROLL_MAX`` the
Cholesky factorization and triangular solves are unrolled in Python over the
static ``d``: each scalar of the recurrence becomes one fused elementwise VPU
op over the whole batch, with no ``lax.while_loop``/gather in sight. This is
the idiomatic TPU mapping for the workload described in SURVEY.md §4.1
("batch×K small-matrix Cholesky/solves, latent dim 2–10ish"); above the
threshold we defer to ``jnp.linalg`` (which is also the oracle in tests).

Reference counterpart: TF1 ``tf.cholesky``/``tf.cholesky_solve`` calls inside
the recalled ``distributions/`` + ``svae.py`` modules (unverified — empty
reference mount, SURVEY.md §0).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# Above this static dimension the unrolled recurrences emit too much code to
# be worthwhile; fall back to lax.linalg implementations. The unroll is a
# big TPU win but inflates CPU compile time at large d on small hosts —
# override via SVAX_UNROLL_MAX (e.g. =4 for CPU smoke tests of d=10 configs).
UNROLL_MAX = int(os.environ.get("SVAX_UNROLL_MAX", "16"))


def add_jitter(a: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Add ``eps * I`` to the trailing (d, d) axes (Cholesky safety, SURVEY §8)."""
    d = a.shape[-1]
    return a + eps * jnp.eye(d, dtype=a.dtype)


def _cholesky_unrolled(a: jnp.ndarray) -> jnp.ndarray:
    """Cholesky–Banachiewicz unrolled over static d; a: (..., d, d) PSD."""
    d = a.shape[-1]
    low = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - low[i][k] * low[j][k]
            if i == j:
                low[i][j] = jnp.sqrt(s)
            else:
                low[i][j] = s / low[j][j]
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [
        jnp.stack([low[i][j] if j <= i else zero for j in range(d)], axis=-1)
        for i in range(d)
    ]
    return jnp.stack(rows, axis=-2)


def cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of PSD matrices with trailing (d, d) axes."""
    if a.shape[-1] <= UNROLL_MAX:
        return _cholesky_unrolled(a)
    return jnp.linalg.cholesky(a)


def solve_tril_vec(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b with L lower-triangular (..., d, d), b (..., d)."""
    d = chol.shape[-1]
    if d > UNROLL_MAX:
        import jax

        return jax.scipy.linalg.solve_triangular(chol, b[..., None], lower=True)[..., 0]
    y: list = []
    for i in range(d):
        s = b[..., i]
        for k in range(i):
            s = s - chol[..., i, k] * y[k]
        y.append(s / chol[..., i, i])
    return jnp.stack(y, axis=-1)


def solve_triu_vec(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = b with L lower-triangular (..., d, d), b (..., d)."""
    d = chol.shape[-1]
    if d > UNROLL_MAX:
        import jax

        return jax.scipy.linalg.solve_triangular(
            chol, b[..., None], lower=True, trans=1
        )[..., 0]
    x: list = [None] * d
    for i in reversed(range(d)):
        s = b[..., i]
        for k in range(i + 1, d):
            s = s - chol[..., k, i] * x[k]
        x[i] = s / chol[..., i, i]
    return jnp.stack(x, axis=-1)


def cho_solve_vec(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given L = chol(A); b has shape (..., d)."""
    return solve_triu_vec(chol, solve_tril_vec(chol, b))


def cho_solve_mat(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B given L = chol(A); B has shape (..., d, m)."""
    m = b.shape[-1]
    cols = [cho_solve_vec(chol, b[..., j]) for j in range(m)]
    return jnp.stack(cols, axis=-1)


def inv_psd(chol: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a PSD matrix from its Cholesky factor; (..., d, d)."""
    d = chol.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=chol.dtype), chol.shape)
    return cho_solve_mat(chol, eye)


def logdet_from_chol(chol: jnp.ndarray) -> jnp.ndarray:
    """log|A| = 2 Σ log diag(L) for L = chol(A); returns (...)."""
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)
