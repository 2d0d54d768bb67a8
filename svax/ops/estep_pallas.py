"""Fused GMM E-step Pallas kernel (SURVEY.md §3b "Pallas kernel library").

TPU-first reformulation of the observed-data E-step (§4.2): with packed
coefficients

    W[:, k] = [ E[logπ_k] + ½E[log|Λ_k|] − ½E[μᵀΛμ]_k − (d/2)log 2π,
                E[Λμ]_k,
                −½ vec(E[Λ_k]) ]

the unnormalized log-responsibilities are a *polynomial-feature matmul*

    log ρ = Φ(x) W,   Φ(x) = [1, x, vec(x xᵀ)]  (N, F),  F = 1 + d + d²,

and the weighted sufficient statistics are the transpose matmul

    S = Φ(x)ᵀ R,      R = softmax_k(log ρ)      (F, K):
    S[0]        = counts N_k
    S[1:1+d]    = Σ r x        (mean stat, transposed)
    S[1+d:]     = Σ r vec(xxᵀ) (scatter stat, transposed)

Both matmuls hit the MXU; the kernel fuses featurization → matmul → softmax
→ stats-matmul in ONE pass over N, so neither Φ (N×F) nor R (N×K) is ever
materialized in HBM — the memory-bound E-step becomes a single read of x.
Statistics accumulate across the N-tile grid in the output block (revisited
every step). A pure-jnp twin (``e_step_stats_reference``) is the oracle in
tests and the fallback on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from svax.pgm.gmm import GmmExpected, GmmSuffStats

_LOG_2PI = 1.8378770664093453


def pack_coeffs(exp: GmmExpected, dtype=jnp.float32) -> jnp.ndarray:
    """Pack expected params into the (F, K) coefficient matrix W."""
    k, d = exp.prec_mean.shape
    c0 = exp.log_pi + 0.5 * exp.logdet - 0.5 * exp.quad - 0.5 * d * _LOG_2PI
    w = jnp.concatenate(
        [c0[None, :], exp.prec_mean.T, -0.5 * exp.prec.reshape(k, d * d).T],
        axis=0,
    )
    return w.astype(dtype)


def _features(x: jnp.ndarray) -> jnp.ndarray:
    """Φ(x) = [1, x, vec(xxᵀ)] along the trailing axis."""
    n, d = x.shape
    ones = jnp.ones((n, 1), dtype=x.dtype)
    outer = (x[:, :, None] * x[:, None, :]).reshape(n, d * d)
    return jnp.concatenate([ones, x, outer], axis=-1)


def unpack_stats(stats: jnp.ndarray, d: int) -> GmmSuffStats:
    """(F, K) accumulated Φᵀ R → GmmSuffStats pytree."""
    counts = stats[0]
    mean_stat = stats[1 : 1 + d].T
    scatter = stats[1 + d :].T.reshape(-1, d, d)
    # Symmetrize: vec(xxᵀ) features make both (i,j) and (j,i) slots carry
    # the same value, so this is a no-op up to float noise.
    scatter = 0.5 * (scatter + jnp.swapaxes(scatter, -1, -2))
    return GmmSuffStats(counts=counts, mean_stat=mean_stat, scatter_stat=scatter)


def e_step_stats_reference(
    x: jnp.ndarray, exp: GmmExpected, scale=1.0
) -> tuple[GmmSuffStats, jnp.ndarray]:
    """Pure-jnp twin of the fused kernel (oracle + non-TPU fallback)."""
    w = pack_coeffs(exp, dtype=x.dtype)
    phi = _features(x)
    logits = jnp.dot(phi, w, precision=jax.lax.Precision.HIGHEST)
    evidence = jax.nn.logsumexp(logits, axis=-1)
    resp = jnp.exp(logits - evidence[:, None])
    stats = jnp.dot(phi.T, resp, precision=jax.lax.Precision.HIGHEST)
    out = unpack_stats(stats, x.shape[-1])
    return jax.tree.map(lambda s: scale * s, out), evidence


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("tile_n",))
def _fused_kernel_call(x_pad, w_pad, mask_pad, tile_n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = x_pad.shape
    f_pad, k_pad = w_pad.shape
    grid = (n_pad // tile_n,)

    def kernel(x_ref, w_ref, mask_ref, stats_ref, ev_ref):
        i = pl.program_id(0)
        x = x_ref[:]
        ones = jnp.ones((tile_n, 1), dtype=x.dtype)
        outer = (x[:, :, None] * x[:, None, :]).reshape(tile_n, d * d)
        phi = jnp.concatenate([ones, x, outer], axis=-1)  # (T, 1+d+d²)
        pad_cols = f_pad - (1 + d + d * d)
        if pad_cols:
            phi = jnp.concatenate(
                [phi, jnp.zeros((tile_n, pad_cols), dtype=x.dtype)], axis=-1
            )
        logits = jnp.dot(phi, w_ref[:], preferred_element_type=jnp.float32)
        ev = jax.nn.logsumexp(logits, axis=-1)  # (T,)
        mask = mask_ref[0, :]  # (T,)
        resp = jnp.exp(logits - ev[:, None]) * mask[:, None]
        ev_ref[0, :] = ev * mask
        contrib = jax.lax.dot_general(
            phi,
            resp,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (F, K)

        @pl.when(i == 0)
        def _init():
            stats_ref[:] = contrib

        @pl.when(i > 0)
        def _acc():
            stats_ref[:] = stats_ref[:] + contrib

    stats, evidence = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((f_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
    )(x_pad, w_pad, mask_pad)
    return stats, evidence


def e_step_stats_fused(
    x: jnp.ndarray,
    exp: GmmExpected,
    scale=1.0,
    tile_n: int = 512,
    interpret_fallback: bool = True,
) -> tuple[GmmSuffStats, jnp.ndarray]:
    """Fused Pallas E-step+stats. Same contract as the reference twin.

    Returns (GmmSuffStats scaled by ``scale``, per-point evidence (N,)).
    Pads N to the tile size and K/F to the 128-lane boundary; padded
    components get −inf logits via the packed-coefficient convention (their
    W columns are −1e30 in the constant row, so softmax zeroes them).
    """
    n, d = x.shape
    k = exp.log_pi.shape[0]
    f = 1 + d + d * d

    backend = jax.default_backend()
    if interpret_fallback and backend not in ("tpu",):
        return e_step_stats_reference(x, exp, scale)

    x32 = x.astype(jnp.float32)
    w = pack_coeffs(exp, dtype=jnp.float32)
    f_pad = _round_up(f, 8)
    k_pad = _round_up(k, 128)
    tile = min(tile_n, _round_up(n, 8))
    n_pad = _round_up(n, tile)

    w_pad = jnp.full((f_pad, k_pad), 0.0, dtype=jnp.float32)
    # Padded components: −1e30 constant term → softmax weight 0.
    w_pad = w_pad.at[0, :].set(-1e30)
    w_pad = w_pad.at[:f, :k].set(w)
    x_pad = jnp.zeros((n_pad, d), dtype=jnp.float32).at[:n].set(x32)
    mask = jnp.zeros((1, n_pad), dtype=jnp.float32).at[0, :n].set(1.0)

    stats, evidence = _fused_kernel_call(x_pad, w_pad, mask, tile)
    out = unpack_stats(stats[:f, :k], d)
    return jax.tree.map(lambda s: scale * s, out), evidence[0, :n]
