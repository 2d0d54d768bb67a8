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

import jax
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


def _tril_half_diag(m: jnp.ndarray) -> jnp.ndarray:
    """Φ(M): keep the strict lower triangle, halve the diagonal."""
    d = m.shape[-1]
    lower = jnp.tril(m, k=-1)
    diag = jnp.diagonal(m, axis1=-2, axis2=-1)
    return lower + 0.5 * diag[..., None] * jnp.eye(d, dtype=m.dtype)


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


def _solve_triu_mat(chol: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Solve Lᵀ X = M columnwise; M (..., d, k) with small static k."""
    cols = [solve_triu_vec(chol, m[..., j]) for j in range(m.shape[-1])]
    return jnp.stack(cols, axis=-1)


@jax.custom_vjp
def cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of PSD matrices with trailing (d, d) axes.

    Carries a custom VJP: XLA's autodiff of the unrolled recurrence
    materializes O(d²) padded N×K×d×d intermediates in the backward pass
    (measured 4.2 GB of traffic per step on the big-K config); the analytic
    backward (Murray 2016, adapted to the lower-triangle-read convention
    verified against the autodiff oracle) is a handful of solves.
    """
    if a.shape[-1] <= UNROLL_MAX:
        return _cholesky_unrolled(a)
    return jnp.linalg.cholesky(a)


def _cholesky_fwd(a):
    chol = cholesky(a)
    return chol, chol


def _cholesky_bwd(chol, lbar):
    """Analytic backward: P = Φ(LᵀL̄); M = L⁻ᵀPL⁻¹; Ā = tril(M+Mᵀ,−1)+diag(M).

    For small static d the whole computation unrolls ENTRY-wise over the
    batch — the einsum/swapaxes formulation forced transposed layouts of
    the N×K×d×d tensors on TPU (three ~41 MB layout copies plus a
    transposed batched matmul ≈ 7 ms/step on the big-K config); the
    unrolled form is pure fused elementwise work in the existing layout.
    """
    d = chol.shape[-1]
    if d > UNROLL_MAX:
        p = _tril_half_diag(
            jnp.einsum(
                "...ji,...jk->...ik", chol, lbar, precision=jax.lax.Precision.HIGHEST
            )
        )
        x = _solve_triu_mat(chol, p)  # L⁻ᵀ P
        m = jnp.swapaxes(_solve_triu_mat(chol, jnp.swapaxes(x, -1, -2)), -1, -2)
        eye = jnp.eye(d, dtype=chol.dtype)
        abar = jnp.tril(m + jnp.swapaxes(m, -1, -2), k=-1) + (
            jnp.diagonal(m, axis1=-2, axis2=-1)[..., None] * eye
        )
        return (abar,)

    L = [[chol[..., i, j] for j in range(d)] for i in range(d)]
    Lb = [[lbar[..., i, j] for j in range(d)] for i in range(d)]
    # P = Φ(Lᵀ L̄): lower triangle, diagonal halved. L[j][i] = 0 for j < i.
    P = [[None] * d for _ in range(d)]
    for i in range(d):
        for k in range(d):
            s = L[i][i] * Lb[i][k]
            for j in range(i + 1, d):
                s = s + L[j][i] * Lb[j][k]
            if k == i:
                s = 0.5 * s
            P[i][k] = s if k <= i else None
    zero = jnp.zeros_like(chol[..., 0, 0])
    Pf = [[P[i][k] if k <= i else zero for k in range(d)] for i in range(d)]
    # X = L⁻ᵀ P: back-substitution over rows (X[i] depends on X[k>i]).
    X = [[None] * d for _ in range(d)]
    for i in reversed(range(d)):
        for c in range(d):
            s = Pf[i][c]
            for k in range(i + 1, d):
                s = s - L[k][i] * X[k][c]
            X[i][c] = s / L[i][i]
    # M = X L⁻¹: back-substitution over columns (M[:,c] depends on M[:,k>c]).
    M = [[None] * d for _ in range(d)]
    for c in reversed(range(d)):
        for i in range(d):
            s = X[i][c]
            for k in range(c + 1, d):
                s = s - M[i][k] * L[k][c]
            M[i][c] = s / L[c][c]
    # Ā = tril(M + Mᵀ, −1) + diag(M).
    rows = []
    for i in range(d):
        row = []
        for j in range(d):
            if j < i:
                row.append(M[i][j] + M[j][i])
            elif j == i:
                row.append(M[i][i])
            else:
                row.append(zero)
        rows.append(jnp.stack(row, axis=-1))
    return (jnp.stack(rows, axis=-2),)


cholesky.defvjp(_cholesky_fwd, _cholesky_bwd)


@jax.custom_vjp
def solve_tril_vec(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b with L lower-triangular (..., d, d), b (..., d).

    Custom VJP (compact analytic backward, verified vs the autodiff
    oracle): b̄ = L⁻ᵀ ȳ,  L̄ = −tril(b̄ ⊗ y).
    """
    d = chol.shape[-1]
    if d > UNROLL_MAX:
        import jax.scipy.linalg as jsl

        return jsl.solve_triangular(chol, b[..., None], lower=True)[..., 0]
    y: list = []
    for i in range(d):
        s = b[..., i]
        for k in range(i):
            s = s - chol[..., i, k] * y[k]
        y.append(s / chol[..., i, i])
    return jnp.stack(y, axis=-1)


def _solve_tril_fwd(chol, b):
    y = solve_tril_vec(chol, b)
    return y, (chol, y)


def _solve_tril_bwd(res, ybar):
    chol, y = res
    bbar = solve_triu_vec(chol, ybar)
    lbar = -jnp.tril(bbar[..., :, None] * y[..., None, :])
    return lbar, bbar


solve_tril_vec.defvjp(_solve_tril_fwd, _solve_tril_bwd)


@jax.custom_vjp
def solve_triu_vec(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve Lᵀ x = b with L lower-triangular (..., d, d), b (..., d).

    Custom VJP: b̄ = L⁻¹ x̄,  L̄ = −tril(x ⊗ b̄).
    """
    d = chol.shape[-1]
    if d > UNROLL_MAX:
        import jax.scipy.linalg as jsl

        return jsl.solve_triangular(chol, b[..., None], lower=True, trans=1)[..., 0]
    x: list = [None] * d
    for i in reversed(range(d)):
        s = b[..., i]
        for k in range(i + 1, d):
            s = s - chol[..., k, i] * x[k]
        x[i] = s / chol[..., i, i]
    return jnp.stack(x, axis=-1)


def _solve_triu_fwd(chol, b):
    x = solve_triu_vec(chol, b)
    return x, (chol, x)


def _solve_triu_bwd(res, xbar):
    chol, x = res
    bbar = solve_tril_vec(chol, xbar)
    lbar = -jnp.tril(x[..., :, None] * bbar[..., None, :])
    return lbar, bbar


solve_triu_vec.defvjp(_solve_triu_fwd, _solve_triu_bwd)


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
