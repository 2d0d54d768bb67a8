"""Fused decoder-output + Bernoulli log-likelihood (Pallas, TPU).

On the large-K MNIST config the (N·K, 784) decoder logits tensor (~320 MB)
is materialized several times per step. The Bernoulli log-likelihood
decomposes as (using logσ(o) − logσ(−o) = o):

    ll[n,r] = Σ_D x·logσ(o) + (1−x)·logσ(−o)
            = ⟨x_n, o_{nr}⟩ + Σ_D logσ(−o_{nr})
            = ⟨h_{nr}, W x_nᵀ⟩ + ⟨x_n, b⟩ + Σ_D logσ(−o_{nr}) .

The x-dependent term needs only y = x Wᵀ — one small (N,D)×(D,Dh) matmul
in plain XLA. The only term that touches the big logits is the x-FREE
row-sum  s(H) = Σ_D logσ(−(H W + b)) over flat rows H (M, Dh), which the
Pallas kernel here computes tile-wise so the logits never leave VMEM;
its custom VJP recomputes the tile and emits (H̄, W̄, b̄) from two deep
matmuls:  ds/do = −σ(o), H̄ = (σ(o)·s̄) ·(−Wᵀ), W̄ = −Hᵀ(σ(o)·s̄).

Public entry: ``fused_bernoulli_loglik(h, w, b, x)`` with h (N, R, Dh) —
falls back to the jnp twin off-TPU; twin = oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def bernoulli_loglik_reference(h, w, b, x):
    """jnp twin: h (N,R,Dh), w (Dh,D), b (D,), x (N,D) → ll (N,R)."""
    logits = jnp.einsum("nrh,hd->nrd", h, w, precision=_HI) + b
    xe = x[:, None, :]
    return jnp.sum(
        xe * jax.nn.log_sigmoid(logits) + (1.0 - xe) * jax.nn.log_sigmoid(-logits),
        axis=-1,
    )


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "precision"))
def _rowsum_fwd_call(h2, w, b2d, tile_m: int, interpret: bool = False,
                     precision=_HI):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m_pad, dh_pad = h2.shape
    d_pad = w.shape[1]
    grid = (m_pad // tile_m,)

    def kernel(h_ref, w_ref, b_ref, s_ref):
        o = (
            jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32,
                    precision=precision)
            + b_ref[0:1, :]
        )  # (T, D) — never leaves VMEM
        s_ref[:, 0:1] = jnp.sum(jax.nn.log_sigmoid(-o), axis=-1, keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, dh_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 128), jnp.float32),
        interpret=interpret,
    )(h2, w, b2d)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "precision"))
def _rowsum_bwd_call(h2, w, b2d, sbar, tile_m: int, interpret: bool = False,
                     precision=_HI):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m_pad, dh_pad = h2.shape
    d_pad = w.shape[1]
    grid = (m_pad // tile_m,)

    def kernel(h_ref, w_ref, b_ref, g_ref, hbar_ref, wbar_ref, bbar_ref):
        i = pl.program_id(0)
        o = (
            jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32,
                    precision=precision)
            + b_ref[0:1, :]
        )
        do = -jax.nn.sigmoid(o) * g_ref[:, 0:1]  # (T, D)
        hbar_ref[:] = jax.lax.dot_general(
            do, w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

        @pl.when(i == 0)
        def _init():
            wbar_ref[:] = jnp.zeros_like(wbar_ref)
            bbar_ref[:] = jnp.zeros_like(bbar_ref)

        wbar_ref[:] += jax.lax.dot_general(
            h_ref[:], do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        bbar_ref[0:1, :] += jnp.sum(do, axis=0, keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, dh_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_m, dh_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, dh_pad), jnp.float32),
            jax.ShapeDtypeStruct((dh_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, d_pad), jnp.float32),
        ),
        interpret=interpret,
    )(h2, w, b2d, sbar)


def _pad_rowsum_operands(h2, w, b, tile_m):
    m, dh = h2.shape
    d = w.shape[1]
    m_pad = _round_up(m, tile_m)
    dh_pad = _round_up(dh, 128)
    d_pad = _round_up(d, 128)
    hp = jnp.zeros((m_pad, dh_pad), jnp.float32).at[:m, :dh].set(h2.astype(jnp.float32))
    wp = jnp.zeros((dh_pad, d_pad), jnp.float32).at[:dh, :d].set(w.astype(jnp.float32))
    # Padded D columns get a large negative bias so logσ(−o_pad) ≈ 0 exactly
    # contributes nothing to the row sum.
    bp = jnp.full((8, d_pad), -40.0, jnp.float32).at[:, :d].set(b.astype(jnp.float32))
    return hp, wp, bp, (m, dh, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _rowsum_logsig_neg(h2, w, b, tile_m: int, interpret: bool = False,
                       precision=_HI):
    """s(H)_m = Σ_D logσ(−(H W + b)); H (M, Dh) flat rows; TPU-fused."""
    hp, wp, bp, (m, dh, d) = _pad_rowsum_operands(h2, w, b, tile_m)
    s = _rowsum_fwd_call(hp, wp, bp, tile_m, interpret=interpret,
                         precision=precision)
    return s[:m, 0].astype(h2.dtype)


def _rowsum_fwd(h2, w, b, tile_m, interpret, precision):
    return _rowsum_logsig_neg(h2, w, b, tile_m, interpret, precision), (h2, w, b)


def _rowsum_bwd(tile_m, interpret, precision, res, sbar):
    h2, w, b = res
    hp, wp, bp, (m, dh, d) = _pad_rowsum_operands(h2, w, b, tile_m)
    gp = jnp.zeros((hp.shape[0], 128), jnp.float32)
    gp = gp.at[:m, :].set(sbar.astype(jnp.float32)[:, None])
    # Only column 0 of g is read in-kernel; replication above is harmless.
    hbar, wbar, bbar = _rowsum_bwd_call(hp, wp, bp, gp, tile_m,
                                        interpret=interpret, precision=precision)
    return (
        hbar[:m, :dh].astype(h2.dtype),
        wbar[:dh, :d].astype(w.dtype),
        bbar[0, :d].astype(b.dtype),
    )


_rowsum_logsig_neg.defvjp(_rowsum_fwd, _rowsum_bwd)


def _kernel_precision(precision):
    """Mosaic dots support only DEFAULT and HIGHEST — no bf16x3 HIGH pass
    (verified on this box's jax 0.9: 'Unsupported dot precision: HIGH').
    HIGH therefore maps to DEFAULT (single-pass bf16, f32 accumulate)
    inside the kernel; callers needing the f32 guarantee pass HIGHEST."""
    if precision == jax.lax.Precision.HIGH:
        return jax.lax.Precision.DEFAULT
    return precision


def rowsum_logsig_neg(h, w, b, tile_m: int = 512, interpret: bool = False,
                      precision=_HI):
    """Public entry: s = Σ_D logσ(−(h·W + b)) over the trailing axis.

    h (..., Dh) with arbitrary leading axes (flattened internally — the
    row-sum is row-order independent); returns (...). The (rows, D) logits
    live only inside the kernel's VMEM tiles; the custom VJP recomputes
    them tile-wise in the backward pass, so neither direction materializes
    them in HBM. This is the HBM-traffic eliminator for the big-K
    Bernoulli decoder (SVAE `fused_decoder`; BASELINE config #5).
    """
    lead = h.shape[:-1]
    flat = h.reshape(-1, h.shape[-1])
    return _rowsum_logsig_neg(
        flat, w, b, tile_m, interpret, _kernel_precision(precision)
    ).reshape(lead)


def fused_bernoulli_loglik(h, w, b, x, tile_m: int = 512, interpret: bool = False):
    """Fused last-layer + Bernoulli log-lik: (N,R,Dh)·(Dh,D)+b vs x → (N,R).

    Off-TPU this is the jnp twin. On TPU: the x-term is two small XLA
    matmuls, the big logits live only inside the row-sum kernel.
    ``interpret=True`` forces the fused path with the kernels run through
    the Pallas interpreter on any backend (the CI path that executes the
    real kernel bodies, SURVEY.md §5).
    """
    if not interpret and jax.default_backend() != "tpu":
        return bernoulli_loglik_reference(h, w, b, x)
    n, r, dh = h.shape
    y = jnp.dot(x, w.T, precision=_HI)  # (N, Dh)
    c = jnp.dot(x, b, precision=_HI)  # (N,)
    t = jnp.einsum("nrh,nh->nr", h, y, precision=_HI) + c[:, None]
    s = _rowsum_logsig_neg(
        h.reshape(n * r, dh), w, b, tile_m, interpret, _HI
    ).reshape(n, r)
    return t + s
