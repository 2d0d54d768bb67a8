"""MLP constructors and likelihood heads (SURVEY.md §3a encoder/decoder rows).

Conventions:
* an MLP is a list of {"w", "b"} dicts; hidden activations are tanh by
  default (paper-typical for the pinwheel nets, SURVEY.md §4.5), the final
  layer is linear;
* the encoder outputs 2·d units split into (mean, raw variance), variance
  via softplus + floor — a *diagonal* Gaussian recognition potential;
* decoders output 2·D (Gaussian head: mean + raw variance) or D (Bernoulli
  logits).

Matmuls run with HIGHEST precision: on TPU the default f32 matmul uses
bf16 passes, and the 1e-4 relative ELBO-parity target (BASELINE.md) needs
full f32 accumulation; these nets are small enough that this is free.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_LOG_2PI = 1.8378770664093453
_VAR_FLOOR = 1e-6


def mlp_init(
    key: jax.Array, sizes: Sequence[int], dtype=jnp.float32, scale: float = 1.0
) -> list[dict]:
    """Glorot-normal init for layer sizes [in, h1, ..., out]."""
    params = []
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        std = scale * jnp.sqrt(2.0 / (n_in + n_out))
        params.append(
            {
                "w": std * jax.random.normal(sub, (n_in, n_out), dtype=dtype),
                "b": jnp.zeros((n_out,), dtype=dtype),
            }
        )
    return params


def mlp_apply(
    params: list[dict],
    x: jnp.ndarray,
    activation: Callable = jnp.tanh,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Hidden layers with ``activation``, linear final layer.

    ``precision`` controls the MXU pass count: HIGHEST (default) keeps full
    f32 accumulation for the parity contract; DEFAULT runs single-pass bf16
    (~3–6× faster matmuls) for throughput-first configs.
    """
    h = x
    for i, layer in enumerate(params):
        h = jnp.dot(h, layer["w"], precision=precision) + layer["b"]
        if i < len(params) - 1:
            h = activation(h)
    return h


# ---------------------------------------------------------------- encoder


def encoder_out_dim(latent_dim: int, head: str = "diag") -> int:
    """Final-layer width for a recognition head: 2d (diag) or
    2d + d(d−1)/2 (full — mean, Cholesky diagonal, strict lower triangle)."""
    if head == "diag":
        return 2 * latent_dim
    if head == "full":
        return 2 * latent_dim + latent_dim * (latent_dim - 1) // 2
    raise ValueError(f"unknown encoder head {head!r} (diag|full)")


def _latent_dim_from_width(width: int, head: str) -> int:
    """Invert encoder_out_dim (both maps are strictly increasing in d)."""
    if head == "diag":
        d = width // 2
    else:
        # w = d² /2 + 3d/2  →  d = (−3 + √(9 + 8w)) / 2
        d = int(round((-3.0 + (9.0 + 8.0 * width) ** 0.5) / 2.0))
    if encoder_out_dim(d, head) != width:
        raise ValueError(
            f"encoder final-layer width {width} is not a {head!r}-head "
            f"width (expected {encoder_out_dim(d, head)} for d={d})"
        )
    return d


def encoder_init(
    key: jax.Array,
    input_dim: int,
    hidden: Sequence[int],
    latent_dim: int,
    dtype=jnp.float32,
    head: str = "diag",
) -> list[dict]:
    return mlp_init(
        key, [input_dim, *hidden, encoder_out_dim(latent_dim, head)],
        dtype=dtype,
    )


def encoder_apply(
    params: list[dict],
    x: jnp.ndarray,
    activation: Callable = jnp.tanh,
    precision=jax.lax.Precision.HIGHEST,
    head: str = "diag",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x (N, D) → Gaussian natural potential (h, P).

    ``head="diag"`` (reference-matching, SURVEY.md §9.4): P is the (N, d)
    diagonal precision p = 1/(softplus(raw) + floor), h = mean · p.

    ``head="full"`` (capability extension; the redraw-gap probe showed the
    diagonal family is part of the residual gap on hard draws): P is a
    full (N, d, d) precision L·Lᵀ with the Cholesky DIAGONAL parameterized
    as 1/√(softplus(raw) + floor) — so zero off-diagonal outputs reproduce
    the diagonal head EXACTLY (same variance floor / precision ceiling),
    making "full" a strict superset with identical guard semantics.
    h = P · mean either way; sin_combine accepts both shapes.
    """
    out = mlp_apply(params, x, activation, precision)
    if head == "diag":
        mean, raw = jnp.split(out, 2, axis=-1)
        var = jax.nn.softplus(raw) + _VAR_FLOOR
        p = 1.0 / var
        return mean * p, p
    d = _latent_dim_from_width(out.shape[-1], head)
    mean, raw, off = jnp.split(out, [d, 2 * d], axis=-1)
    ldiag = 1.0 / jnp.sqrt(jax.nn.softplus(raw) + _VAR_FLOOR)
    idx = jnp.arange(d)
    ell = jnp.zeros(out.shape[:-1] + (d, d), out.dtype)
    ell = ell.at[..., idx, idx].set(ldiag)
    if d > 1:
        rr, cc = np.tril_indices(d, -1)
        ell = ell.at[..., rr, cc].set(off)
    p_full = jnp.einsum(
        "...ij,...kj->...ik", ell, ell, precision=jax.lax.Precision.HIGHEST
    )
    h = jnp.einsum(
        "...ij,...j->...i", p_full, mean, precision=jax.lax.Precision.HIGHEST
    )
    return h, p_full


# ---------------------------------------------------------------- decoders


def decoder_init(
    key: jax.Array,
    latent_dim: int,
    hidden: Sequence[int],
    output_dim: int,
    likelihood: str = "gaussian",
    dtype=jnp.float32,
) -> list[dict]:
    mult = 2 if likelihood == "gaussian" else 1
    return mlp_init(key, [latent_dim, *hidden, mult * output_dim], dtype=dtype)


def decoder_apply(
    params: list[dict],
    z: jnp.ndarray,
    likelihood: str = "gaussian",
    activation: Callable = jnp.tanh,
    precision=jax.lax.Precision.HIGHEST,
    compute_dtype=None,
):
    """z (..., d) → likelihood params: (mean, var) or logits.

    ``compute_dtype=jnp.bfloat16`` runs the MLP body (matmuls + hidden
    activations) in bf16 and returns f32 head params — the per-row HBM
    bandwidth play for huge (S·N·K)-row batches; head math stays f32 so
    the variance floor survives.
    """
    if compute_dtype is not None:
        z = z.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
        precision = jax.lax.Precision.DEFAULT
    out = mlp_apply(params, z, activation, precision)
    if compute_dtype is not None:
        out = out.astype(jnp.float32)
    if likelihood == "gaussian":
        mean, raw = jnp.split(out, 2, axis=-1)
        return mean, jax.nn.softplus(raw) + _VAR_FLOOR
    return out


def gaussian_loglik(x: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """Σ_D log N(x | mean, var), diagonal; broadcasts x against mean/var."""
    return -0.5 * jnp.sum(
        jnp.log(var) + (x - mean) ** 2 / var + _LOG_2PI, axis=-1
    )


def bernoulli_loglik(x: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Σ_D log Bernoulli(x | σ(logits)); x in [0, 1] (binarized or soft)."""
    return jnp.sum(
        x * jax.nn.log_sigmoid(logits) + (1.0 - x) * jax.nn.log_sigmoid(-logits),
        axis=-1,
    )


def bernoulli_loglik_decomposed(
    params: list[dict],
    z: jnp.ndarray,
    x: jnp.ndarray,
    activation: Callable = jnp.tanh,
    precision=jax.lax.Precision.HIGHEST,
    fused: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """Bernoulli log-lik via ll = ⟨x, o⟩ + Σ_D logσ(−o) (since
    logσ(o) − logσ(−o) = o): the x-dependent part reduces to tiny matmuls
    with the LAST layer's weights, and the big logits elementwise becomes
    x-free — measured ~12% faster fwd+bwd than the broadcast form on v5e
    at the big-K shape. z (..., N, K, d); x (N, D) UNbroadcast. Returns
    (..., N, K).

    ``fused=True`` routes the x-free row-sum through the Pallas kernel
    (svax.ops.decoder_pallas): the (rows, D) logits stay in VMEM tiles in
    both directions instead of costing ~2·rows·D·4 bytes of HBM traffic
    per pass — the big-K step is memory-bound (benchmarks/mfu.py), so this
    is a bandwidth play, not a FLOP play. Off-TPU it falls back here.

    ``compute_dtype=jnp.bfloat16`` runs the big (S·N·K)-row tensors — the
    hidden activations and the logits — in bf16, HALVING their HBM traffic
    in both directions (the residuals XLA saves for the backward shrink
    too). All (n, k)-shaped reductions still accumulate in f32: the ⟨x, o⟩
    einsum via ``preferred_element_type`` and the x-free row-sum via an
    f32-accumulating ``jnp.sum``, so only the elementwise storage is lossy.
    A bandwidth play for the memory-bound big-K step; None keeps full f32.
    """
    if compute_dtype is not None:
        out_dtype = z.dtype
        z = z.astype(compute_dtype)
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
        precision = jax.lax.Precision.DEFAULT
    else:
        out_dtype = None
    h = z
    for layer in params[:-1]:
        h = activation(
            jnp.dot(h, layer["w"], precision=precision) + layer["b"]
        )
    last = params[-1]
    # Under bf16 compute, every (n, k)-shaped reduction accumulates f32;
    # with compute_dtype=None the input dtype (f32 or the f64 oracle) is
    # preserved untouched.
    acc = jnp.float32 if compute_dtype is not None else None
    y = jnp.dot(x, last["w"].T, precision=precision)  # (N, Dh)
    c = jnp.dot(x, last["b"], precision=precision, preferred_element_type=acc)
    t = (
        jnp.einsum(
            "...nkh,nh->...nk", h, y, precision=precision,
            preferred_element_type=acc,
        )
        + c[..., :, None]
    )
    # The Pallas row-sum kernel is f32-only (its layouts and VJP are tuned
    # for 4-byte tiles); under bf16 compute the XLA path below is used.
    if fused and compute_dtype is None and jax.default_backend() == "tpu":
        from svax.ops import decoder_pallas

        return t + decoder_pallas.rowsum_logsig_neg(
            h, last["w"], last["b"], precision=precision
        )
    o = jnp.dot(h, last["w"], precision=precision) + last["b"]
    rowsum = jnp.sum(jax.nn.log_sigmoid(-o), axis=-1, dtype=acc)
    ll = t + rowsum
    return ll if out_dtype is None else ll.astype(out_dtype)


def log_likelihood(
    params: list[dict],
    z: jnp.ndarray,
    x: jnp.ndarray,
    likelihood: str = "gaussian",
    activation: Callable = jnp.tanh,
    precision=jax.lax.Precision.HIGHEST,
    compute_dtype=None,
) -> jnp.ndarray:
    """log p(x | z) under the configured head; broadcasts over sample axes."""
    if likelihood == "gaussian":
        mean, var = decoder_apply(
            params, z, likelihood, activation, precision, compute_dtype
        )
        return gaussian_loglik(x, mean, var)
    logits = decoder_apply(params, z, likelihood, activation, precision, compute_dtype)
    return bernoulli_loglik(x, logits)
