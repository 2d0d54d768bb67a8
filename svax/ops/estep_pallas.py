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


@functools.partial(jax.jit, static_argnames=("tile_n", "d", "d_pad", "interpret"))
def _fused_kernel_call(
    xt_pad, wt_slots, mask_pad, tile_n: int, d: int, d_pad: int, interpret: bool = False
):
    """Transposed, slot-aligned fused kernel.

    Every logical coefficient/statistic block lives in its own 128-lane
    slot so all lane slices start at multiples of 128 (no Mosaic
    relayouts). Layouts:
      xt_pad   (d_pad, N)            — data transposed, N on lanes
      wt_slots (K_pad, (2+d)·128)    — slot 0 col 0: c0; slot 1 cols
                                       0..d_pad: E[Λμ]; slot 2+a: −½E[Λ]
                                       rows for x_a (zero-padded)
      mask     (8, N)                — row-replicated validity mask
    Output stats use the same slot layout; logits come from 1+d
    HIGHEST-precision MXU dots with d_pad-deep contractions.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, n_pad = xt_pad.shape
    k_pad, slots_lanes = wt_slots.shape
    grid = (n_pad // tile_n,)
    hi = jax.lax.Precision.HIGHEST

    f_slots = 8 + d_pad + d * d_pad  # sublane-slot feature count

    def kernel(x_ref, w_ref, mask_ref, stats_ref, ev_ref):
        # Build the full Φᵀ tile once (sublane concat, cheap VMEM copies),
        # then TWO deep MXU matmuls — the tiny-d contractions of earlier
        # revisions serialized the MXU pipeline and were 50× slower.
        i = pl.program_id(0)
        xt = x_ref[:]  # (d_pad, T); rows ≥ d are zero
        blocks = [
            jnp.concatenate(
                [jnp.ones((1, tile_n), jnp.float32), jnp.zeros((7, tile_n), jnp.float32)],
                axis=0,
            ),
            xt,
        ]
        for a in range(d):
            blocks.append(xt * xt[a : a + 1, :])
        pad_rows = slots_lanes - f_slots
        if pad_rows:
            blocks.append(jnp.zeros((pad_rows, tile_n), jnp.float32))
        phi = jnp.concatenate(blocks, axis=0)  # (slots_lanes, T)

        logits = jnp.dot(
            w_ref[:], phi, preferred_element_type=jnp.float32, precision=hi
        )  # (K, T)
        m = jnp.max(logits, axis=0, keepdims=True)  # (1, T)
        ex = jnp.exp(logits - m)
        denom = jnp.sum(ex, axis=0, keepdims=True)  # (1, T)
        ev = m + jnp.log(denom)  # (1, T)
        mask = mask_ref[0:1, :]  # (1, T)
        resp = (ex / denom) * mask  # (K, T)
        ev_ref[0:1, :] = ev * mask

        contrib = jax.lax.dot_general(
            resp, phi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )  # (K, slots_lanes)

        @pl.when(i == 0)
        def _init():
            stats_ref[:] = contrib

        @pl.when(i > 0)
        def _acc():
            stats_ref[:] = stats_ref[:] + contrib

    stats_t, evidence = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((xt_pad.shape[0], tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, slots_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k_pad, slots_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k_pad, slots_lanes), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ),
        interpret=interpret,
    )(xt_pad, wt_slots, mask_pad)
    return stats_t, evidence


def e_step_stats_fused(
    x: jnp.ndarray,
    exp: GmmExpected,
    scale=1.0,
    tile_n: int = 512,
    interpret_fallback: bool = True,
    interpret: bool = False,
) -> tuple[GmmSuffStats, jnp.ndarray]:
    """Fused Pallas E-step+stats. Same contract as the reference twin.

    Returns (GmmSuffStats scaled by ``scale``, per-point evidence (N,)).
    Pads N to the tile size and K/F to the 128-lane boundary; padded
    components get −inf logits via the packed-coefficient convention (their
    W columns are −1e30 in the constant row, so softmax zeroes them).

    ``interpret=True`` runs the ACTUAL kernel body through the Pallas
    interpreter on any backend — the CI path that executes the Mosaic
    program (padding, masking, slot layout, accumulation) off-TPU, per
    SURVEY.md §5 ("the reference impl stays in-tree as the interpret-mode
    oracle").
    """
    if not interpret:
        backend = jax.default_backend()
        if interpret_fallback and backend not in ("tpu",):
            return e_step_stats_reference(x, exp, scale)
    return _fused_entry(x, exp, scale, tile_n, interpret)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _fused_entry(x, exp, scale, tile_n: int, interpret: bool = False):
    """Jitted pack → kernel → unpack (one dispatch end-to-end)."""
    n, d = x.shape
    k = exp.log_pi.shape[0]

    x32 = x.astype(jnp.float32)
    d_pad = _round_up(d, 8)
    k_pad = _round_up(k, 8)
    tile = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile)

    # Wᵀ in the kernel's sublane-slot feature order: col 0 = c0 (cols 1..7
    # pair with zero rows of Φ), cols 8.. = E[Λμ] (d_pad-strided), then one
    # d_pad-wide block of −½E[Λ] rows per x_a. Padded components get −1e30
    # constant term so their softmax weight is 0.
    f_slots = 8 + d_pad + d * d_pad
    f_pad = _round_up(f_slots, 128)
    c0 = (
        exp.log_pi + 0.5 * exp.logdet - 0.5 * exp.quad - 0.5 * d * _LOG_2PI
    ).astype(jnp.float32)
    wt = jnp.zeros((k_pad, f_pad), dtype=jnp.float32)
    wt = wt.at[:, 0].set(-1e30)
    wt = wt.at[:k, 0].set(c0)
    wt = wt.at[:k, 8 : 8 + d].set(exp.prec_mean.astype(jnp.float32))
    for a in range(d):
        off = 8 + d_pad + a * d_pad
        wt = wt.at[:k, off : off + d].set(-0.5 * exp.prec[:, a, :].astype(jnp.float32))
    xt_pad = jnp.zeros((d_pad, n_pad), dtype=jnp.float32).at[:d, :n].set(x32.T)
    mask = jnp.zeros((8, n_pad), dtype=jnp.float32).at[:, :n].set(1.0)

    stats_t, evidence = _fused_kernel_call(
        xt_pad, wt, mask, tile, d, d_pad, interpret=interpret
    )
    counts = stats_t[:k, 0]
    mean_stat = stats_t[:k, 8 : 8 + d]
    scatter = jnp.stack(
        [
            stats_t[:k, 8 + d_pad + a * d_pad : 8 + d_pad + a * d_pad + d]
            for a in range(d)
        ],
        axis=1,
    )  # (K, d, d)
    scatter = 0.5 * (scatter + jnp.swapaxes(scatter, -1, -2))
    out = GmmSuffStats(counts=counts, mean_stat=mean_stat, scatter_stat=scatter)
    return jax.tree.map(lambda s: scale * s, out), evidence[0, :n]
