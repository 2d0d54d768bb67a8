"""Structured VAE: SIN combine, mixture reparam sampling, structured ELBO.

The L2 core of the framework (SURVEY.md §2, §4.1, §9.4–§9.6). One forward
pass computes, entirely in closed form except the reconstruction Monte
Carlo:

1. encoder potentials (hₙ, Pₙ) — diagonal Gaussian recognition messages;
2. SIN combine with the expected GMM component naturals:
   J̃_nk = diag(Pₙ) + E[Λ_k],  μ̃_nk = J̃⁻¹(hₙ + E[Λμ]_k);
3. mixture responsibilities r̃_nk = softmax_k of the product-of-Gaussians
   log-normalizer plus E[log π_k] (§9.4);
4. S reparameterized samples per (n, k) through the decoder, recon term
   weighted by r̃ (§9.6);
5. the local KL term E_q[log p̄(z,k) − log q(z,k|x)] in closed form;
6. global conjugate KLs and the CVI sufficient statistics (§9.5).

Everything is one jittable pure function; the N×K×d×d combine runs on the
unrolled static-d Cholesky path (svax.ops) so it fuses on the VPU, and the
S·N·K decoder evaluations batch into MXU matmuls.

Reference counterpart: recalled ``svae.py`` graph builders (unverified —
empty mount, SURVEY.md §0).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from svax.nets import mlp as nets
from svax.ops import batched_linalg as bl
from svax.pgm import gmm
from svax.pgm.gmm import GmmExpected, GmmNat, GmmSuffStats

_LOG_2PI = 1.8378770664093453

# Test hook: route SvaeConfig.fused_combine through the Pallas interpreter
# off-TPU so CI executes the real kernel bodies inside forward()
# (tests/test_combine_kernel.py sets this via monkeypatch).
_COMBINE_INTERPRET = False


class SvaeConfig(NamedTuple):
    """Static configuration of the SVAE graph (hashable, jit-static)."""

    latent_dim: int
    num_components: int
    num_samples: int = 1  # S Monte-Carlo samples for the recon term
    likelihood: str = "gaussian"  # or "bernoulli"
    num_total: int = 1  # dataset size N for minibatch scaling
    jitter: float = 0.0  # added to J̃ diagonals if > 0
    activation: Callable = jnp.tanh
    # MXU pass count for the NN matmuls. Default HIGH (bf16x3): measured
    # 2.2e-7 relative ELBO deviation from full-f32 HIGHEST on the MNIST
    # shape — 500x inside the 1e-4 parity bar — at 21% faster big-K steps.
    # HIGHEST forces full f32; DEFAULT is single-pass bf16 (throughput
    # hunts). The PGM/conjugate path always stays HIGHEST regardless.
    nn_precision: jax.lax.Precision = jax.lax.Precision.HIGH
    # Rematerialize the SIN combine in the backward pass: the N×K×d×d
    # intermediates dominate HBM at large batch/K; remat trades ~1 extra
    # forward combine for dropping them from the residual set.
    remat_combine: bool = False
    # Route the Bernoulli decoder's x-free row-sum through the Pallas
    # kernel so the (S·N·K, D) logits never hit HBM (fwd AND bwd) — the
    # big-K step is memory-bound (benchmarks/mfu.py). No-op off-TPU and
    # for Gaussian likelihoods.
    fused_decoder: bool = False
    # Student-t mixture latent prior (svax.models.svae_smm): degrees of
    # freedom (> 0 activates the SMM variant there; this module ignores
    # it) and the number of u–z coordinate rounds inside the combine.
    dof: float = 0.0
    smm_iters: int = 2
    # Envelope-theorem gradients for the SMM u-rounds: stop-gradient the
    # converged q(u) parameters so the backward pass skips the num_iters
    # coordinate combines (exact at the u-fixed point; measured bias +
    # step-cost numbers in BASELINE.md).
    smm_envelope_grads: bool = False
    # Decoder compute dtype: "bfloat16" runs the (S·N·K)-row decoder body
    # (hidden activations + logits) in bf16 with f32 accumulation of every
    # (n, k) reduction — halves the dominant HBM streams of the memory-
    # bound big-K step (benchmarks/mfu.py). "float32" keeps the parity
    # path exact; the PGM/conjugate path is unaffected either way.
    nn_compute_dtype: str = "float32"
    # Fully-fused Bernoulli MLP-decoder Pallas kernel
    # (svax.ops.decoder_mlp_pallas): hidden activations and logits never
    # touch HBM in either direction (recompute backward). Requires a
    # 2-hidden-layer tanh decoder with a Bernoulli head; measured 2.13 vs
    # 2.35 ms fwd+bwd against the XLA bf16 path at the big-K shape.
    # Supersedes remat_decoder when active (nothing is stored anyway).
    fused_mlp_decoder: bool = False
    # Rematerialize the decoder in the backward pass: drops the
    # (S·N·K, hidden) activation residuals from HBM and recomputes the
    # bf16 matmuls instead. Back-to-back on the big-K step: 2.88–2.98 vs
    # 3.05–3.17 ms (~6% win; the recompute is ~free at 1-pass bf16) —
    # pinned for bigk-dp. Negative at the mnist shape (0.357 vs 0.322:
    # the small residual set is cheaper than the recompute there).
    remat_decoder: bool = False
    # Route the SIN combine + local KL + sampling + sufficient statistics
    # through the fused Pallas kernel (svax.ops.combine_pallas): the
    # N·K·d·d Cholesky/inverse/ezz intermediates never touch HBM in either
    # direction (the backward recomputes per tile in VMEM). Measured 3.9×
    # on the combine at the big-K shape (1.29 vs 5.02 ms fwd+bwd) with
    # gradients matching XLA to ~2e-5. No-op off-TPU; requires
    # recon_mode="weighted" and no component sharding.
    fused_combine: bool = False
    # With fused_combine: generate ε inside the kernel with the hardware
    # PRNG (Box–Muller, the tinystep-megakernel recipe) instead of a
    # threefry op + (S, N, K, d) HBM round-trip — measured 0.28 ms of the
    # 2.5 ms bigk step. Different random stream than jax.random (same
    # distribution); ignored when eps is injected or in interpret mode
    # (no CPU lowering for the PRNG primitives). HW parity pinned by the
    # ε-recovery test in benchmarks/verify_kernel_rng_tpu.py.
    kernel_rng: bool = False
    # Recognition-potential family. "diag" (reference-matching, §9.4):
    # the encoder emits per-point diagonal Gaussian precisions. "full":
    # a Cholesky-parameterized full (d, d) precision per point — a strict
    # superset (zero off-diagonals reproduce "diag" exactly, nets.mlp
    # docstring) motivated by the redraw-gap probe, where the diagonal
    # family was part of the residual gap on hard draws. The fused
    # combine / megakernel engines implement "diag" only and gate loudly.
    encoder_head: str = "diag"
    # Reconstruction estimator. "weighted" (default, reference-matching):
    # decode S samples for EVERY component, Σ_k r̃·E[log p(x|z_k)] — exact
    # in k, S·N·K decoder rows. "sampled": draw k̂ ~ Cat(r̃) per (s, n) and
    # decode only that component's sample — an UNBIASED estimator of the
    # same recon term using S·N rows (K× less decoder traffic; the big-K
    # step is decoder-bound). The r̃-gradient is recovered by a REINFORCE
    # term with a per-point baseline (mean over S when S > 1), so encoder
    # gradients stay unbiased too (tested). Closed-form local/global KLs
    # and the CVI statistics are untouched — still exact over all K.
    recon_mode: str = "weighted"

    @property
    def decoder_compute_dtype(self):
        return None if self.nn_compute_dtype == "float32" else jnp.dtype(
            self.nn_compute_dtype
        )


_FUSED_OMITTED_MSG = (
    "this SinPosterior came from the fused combine kernel "
    "(SvaeConfig.fused_combine=True), which keeps prec_chol/cov/"
    "logdet_prec VMEM-resident and does not return them (they are None, "
    "which JAX flattens away so the pytree stays jit-safe); rerun with "
    "fused_combine=False (the sin_combine XLA path) to get them."
)


def _require_full_posterior(post: "SinPosterior", caller: str) -> None:
    if post.prec_chol is None or post.cov is None or post.logdet_prec is None:
        raise ValueError(f"{caller}: {_FUSED_OMITTED_MSG}")


class SinPosterior(NamedTuple):
    """Per-(n,k) structured posterior q(z|x,k) and mixture weights."""

    mean: jnp.ndarray  # (N, K, d) μ̃
    prec_chol: jnp.ndarray  # (N, K, d, d) chol(J̃)
    cov: jnp.ndarray  # (N, K, d, d) Σ̃ = J̃⁻¹
    log_resp: jnp.ndarray  # (N, K) normalized log r̃
    logdet_prec: jnp.ndarray  # (N, K) log|J̃|


class SvaeOutputs(NamedTuple):
    elbo: jnp.ndarray  # scalar, full-dataset scale
    recon: jnp.ndarray  # scaled Σ_n Σ_k r̃·E[log p(x|z)]
    local_kl: jnp.ndarray  # scaled −Σ_n E_q[log p̄ − log q]  (≥ 0)
    global_kl: jnp.ndarray  # KL(q(θ)‖p(θ))
    suff_stats: GmmSuffStats  # CVI payload (already N/M-scaled, pre-psum)
    posterior: SinPosterior


def sin_combine(
    pot_h: jnp.ndarray,
    pot_p: jnp.ndarray,
    exp: GmmExpected,
    jitter: float = 0.0,
    axis_comp: str | None = None,
) -> SinPosterior:
    """Conjugate message-passing combine of encoder and PGM messages (§9.4).

    pot_h (N, d), pot_p (N, d) diagonal — or (N, d, d) full-covariance —
    encoder potential; exp: expected GMM naturals. Returns the (N, K)
    family of Gaussian posteriors and mixture log-responsibilities. The
    responsibility formula drops per-n constants (they cancel in the
    softmax over k), so it is correct for both potential shapes. With
    ``axis_comp``, exp holds a K-shard and the responsibility softmax
    normalizes across the mesh axis (component parallelism): one pmax +
    one psum per combine.
    """
    d = pot_h.shape[-1]
    eye = jnp.eye(d, dtype=pot_h.dtype)
    # J̃_nk = Pₙ + E[Λ_k]  → (N, K, d, d)
    if pot_p.ndim == pot_h.ndim + 1:
        pot_prec = pot_p  # full (N, d, d) precision message
    else:
        pot_prec = pot_p[:, :, None] * eye  # diag (N, d) → (N, d, d)
    prec = pot_prec[:, None] + exp.prec[None, :, :, :]
    if jitter > 0.0:
        prec = prec + jitter * eye
    h = pot_h[:, None, :] + exp.prec_mean[None, :, :]  # (N, K, d)
    chol = bl.cholesky(prec)
    mean = bl.cho_solve_vec(chol, h)
    logdet_prec = bl.logdet_from_chol(chol)
    cov = bl.inv_psd(chol)
    # log r̃ ∝ E[logπ] + ½E[log|Λ|] − ½E[μᵀΛμ] + ½ μ̃ᵀ(h+h̄) − ½ log|J̃|
    log_rho = (
        exp.log_pi[None, :]
        + 0.5 * exp.logdet[None, :]
        - 0.5 * exp.quad[None, :]
        + 0.5 * jnp.sum(mean * h, axis=-1)
        - 0.5 * logdet_prec
    )
    if axis_comp is None:
        log_resp = jax.nn.log_softmax(log_rho, axis=-1)
    else:
        log_resp = log_rho - gmm.lse_over_components(log_rho, axis_comp)[:, None]
    return SinPosterior(
        mean=mean, prec_chol=chol, cov=cov, log_resp=log_resp, logdet_prec=logdet_prec
    )


def sample_posterior(
    key: jax.Array,
    post: SinPosterior,
    num_samples: int,
    eps: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """S reparameterized draws z = μ̃ + L̃⁻ᵀε per (n, k): (S, N, K, d).

    ``eps`` overrides the random draw (used by parity tests to run identical
    noise through float32 and float64 paths).
    """
    _require_full_posterior(post, "sample_posterior")
    shape = (num_samples,) + post.mean.shape
    if eps is None:
        eps = jax.random.normal(key, shape, dtype=post.mean.dtype)
    else:
        eps = eps.astype(post.mean.dtype)
    z = post.mean[None] + bl.solve_triu_vec(
        jnp.broadcast_to(post.prec_chol, (num_samples,) + post.prec_chol.shape), eps
    )
    return z


def _weighted_loglik_fn(config: SvaeConfig):
    """The decoder log-likelihood callable, optionally remat-wrapped."""
    if config.remat_decoder:
        return jax.checkpoint(_weighted_loglik, static_argnums=(3,))
    return _weighted_loglik


def _weighted_loglik(dec_params, z, x, config: SvaeConfig) -> jnp.ndarray:
    """Decoder log-likelihood batched over (S, N, K) — shared by the XLA
    and fused-combine paths."""
    if (
        config.fused_mlp_decoder
        and config.likelihood == "bernoulli"
        and len(dec_params) == 3
        and config.activation is jnp.tanh
        and (jax.default_backend() == "tpu" or _COMBINE_INTERPRET)
    ):
        from svax.ops import decoder_mlp_pallas

        return decoder_mlp_pallas.bernoulli_mlp_loglik_fused(
            dec_params, z, x, interpret=_COMBINE_INTERPRET
        )
    if config.likelihood == "bernoulli":
        # x-free big-logits formulation — measurably faster (nets docstring).
        return nets.bernoulli_loglik_decomposed(
            dec_params, z, x, config.activation, config.nn_precision,
            fused=config.fused_decoder,
            compute_dtype=config.decoder_compute_dtype,
        )
    return nets.log_likelihood(
        dec_params,
        z,
        x[None, :, None, :],
        config.likelihood,
        config.activation,
        config.nn_precision,
        compute_dtype=config.decoder_compute_dtype,
    )  # (S, N, K)


def _recon_sampled(
    dec_params: list,
    post: SinPosterior,
    x: jnp.ndarray,
    key: jax.Array,
    config: SvaeConfig,
) -> jnp.ndarray:
    """Sampled-component recon estimator: per-point (N,) values.

    Unbiased for Σ_k r̃_nk E_{q(z|n,k)}[log p(x|z)]: k̂_sn ~ Cat(r̃_n) by
    Gumbel-max (sampling is gradient-stopped), z ~ q(z|n,k̂) by the usual
    L̃⁻ᵀε reparameterization — so the decoder sees S·N rows instead of
    S·N·K. The ∂r̃/∂φ pathway the sampling discards is restored by the
    score-function (REINFORCE) surrogate ``sg(ll − b)·(log r̃_k̂ −
    sg(log r̃_k̂))``, which adds 0 to the value and the missing
    E[ll·∇log r̃] to the gradient; the baseline b is the per-point mean
    over the S samples (S > 1) — gradient-valid since E[∇log r̃] = 0.
    """
    _require_full_posterior(post, "_recon_sampled")
    s = config.num_samples
    n, k, d = post.mean.shape
    k_cat, k_norm = jax.random.split(key)
    log_resp_sg = jax.lax.stop_gradient(post.log_resp)
    gumbel = jax.random.gumbel(k_cat, (s, n, k), dtype=post.mean.dtype)
    khat = jnp.argmax(log_resp_sg[None] + gumbel, axis=-1)  # (S, N)

    sel = khat[..., None, None]  # (S, N, 1, 1)
    mean_sel = jnp.take_along_axis(
        jnp.broadcast_to(post.mean[None], (s, n, k, d)), sel, axis=2
    )[:, :, 0, :]  # (S, N, d)
    chol_sel = jnp.take_along_axis(
        jnp.broadcast_to(post.prec_chol[None], (s, n, k, d, d)),
        sel[..., None], axis=2,
    )[:, :, 0, :, :]  # (S, N, d, d)
    eps = jax.random.normal(k_norm, (s, n, d), dtype=post.mean.dtype)
    z = mean_sel + bl.solve_triu_vec(chol_sel, eps)  # (S, N, d)

    ll = nets.log_likelihood(
        dec_params, z, x[None], config.likelihood, config.activation,
        config.nn_precision, compute_dtype=config.decoder_compute_dtype,
    )  # (S, N)
    logr_sel = jnp.take_along_axis(
        jnp.broadcast_to(post.log_resp[None], (s, n, k)),
        khat[..., None], axis=-1,
    )[..., 0]  # (S, N) — selected log r̃ WITH gradient
    if s > 1:
        # Leave-one-out baseline: a self-inclusive mean correlates with the
        # sample's own ll and biases E[sg(ll−b)·∇log r̃]; LOO is exact.
        baseline = (jnp.sum(ll, axis=0, keepdims=True) - ll) / (s - 1)
    else:
        # Leave-one-out batch baseline: other points' ll are independent
        # of this point's k̂, so E[b·∇log r̃] = b̄·E[∇log r̃] = 0 — exactly
        # unbiased. (A self-inclusive batch mean carries the point's own
        # ll at weight 1/N, correlated with its own k̂ — an O(1/N) bias.)
        denom = jnp.maximum(ll.size - 1, 1)
        baseline = (jnp.sum(ll) - ll) / denom
    reinforce = jax.lax.stop_gradient(ll - baseline) * (
        logr_sel - jax.lax.stop_gradient(logr_sel)
    )
    return jnp.mean(ll + reinforce, axis=0)  # (N,)


def local_kl_term(post: SinPosterior, exp: GmmExpected) -> jnp.ndarray:
    """−Σ_k r̃ E_q[log p̄(z,k) − log q(z,k|x)] per datapoint, closed form (§9.6).

    With ḡ_k = ½E[log|Λ|] − (d/2)log2π − ½E[μᵀΛμ]:
      E_q(z|n,k)[log p̄(z,k)] = E[logπ_k] + ḡ_k + h̄_kᵀμ̃ − ½(tr(J̄Σ̃) + μ̃ᵀJ̄μ̃)
      E_q(z|n,k)[log q(z|n,k)] = −(d/2)(1+log2π) + ½log|J̃|
    Returns (N,) of KL(q(z,k|x) ‖ p̄(z,k)) ≥ 0 (up to MC-free exactness).
    """
    _require_full_posterior(post, "local_kl_term")
    d = post.mean.shape[-1]
    resp = jnp.exp(post.log_resp)
    g_k = 0.5 * exp.logdet - 0.5 * d * _LOG_2PI - 0.5 * exp.quad  # (K,)
    cross = jnp.einsum(
        "ki,nki->nk", exp.prec_mean, post.mean, precision=jax.lax.Precision.HIGHEST
    )
    tr_term = jnp.einsum(
        "kij,nkij->nk", exp.prec, post.cov, precision=jax.lax.Precision.HIGHEST
    )
    quad_mu = jnp.einsum(
        "nki,kij,nkj->nk",
        post.mean,
        exp.prec,
        post.mean,
        precision=jax.lax.Precision.HIGHEST,
    )
    e_log_pbar = exp.log_pi[None, :] + g_k[None, :] + cross - 0.5 * (tr_term + quad_mu)
    e_log_q = post.log_resp - 0.5 * d * (1.0 + _LOG_2PI) + 0.5 * post.logdet_prec
    return -jnp.sum(resp * (e_log_pbar - e_log_q), axis=-1)


def forward(
    nn_params: dict,
    pgm_nat: GmmNat,
    prior_nat: GmmNat,
    x: jnp.ndarray,
    key: jax.Array,
    config: SvaeConfig,
    eps: jnp.ndarray | None = None,
    axis_comp: str | None = None,
) -> SvaeOutputs:
    """Full SVAE forward pass → structured ELBO + CVI payload (§4.1 stack).

    With ``axis_comp`` the PGM naturals (and suff-stat outputs) are K-shards
    over that mesh axis — component parallelism: each device decodes only
    its components' samples, and the softmax/Σ_k reductions ride the axis.
    The returned recon/local/global terms are comp-global (replicated).
    """
    n = x.shape[0]
    scale = config.num_total / n
    if config.recon_mode == "sampled":
        assert axis_comp is None, (
            "recon_mode='sampled' needs the full responsibility row; it does "
            "not compose with component parallelism — use 'weighted'."
        )
        assert eps is None, "eps injection is a weighted-mode parity hook"

    exp = gmm.expected_params(pgm_nat, axis_comp=axis_comp)
    pot_h, pot_p = nets.encoder_apply(
        nn_params["encoder"], x, config.activation, config.nn_precision,
        head=config.encoder_head,
    )

    use_fused_combine = (
        config.fused_combine
        and config.recon_mode == "weighted"
        and config.jitter == 0.0
        and pot_p.ndim == 2  # the kernel's layouts are diag-potential only
        and (jax.default_backend() == "tpu" or _COMBINE_INTERPRET)
    )
    if use_fused_combine:
        from svax.ops import combine_pallas

        # K under axis_comp is this shard's slice; eps matches it.
        k_here = exp.log_pi.shape[0]
        seed = None
        if eps is None:
            if config.kernel_rng and not _COMBINE_INTERPRET:
                # In-kernel hardware PRNG: skip the threefry op and the
                # (S, N, K, d) HBM round-trip (0.28 ms of the 2.5 ms bigk
                # step). ε never exists outside VMEM; the key folds to an
                # int32 seed.
                seed = jax.random.randint(
                    key, (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
            else:
                eps = jax.random.normal(
                    key,
                    (config.num_samples, n, k_here, config.latent_dim),
                    dtype=jnp.float32,
                )
        if axis_comp is None:
            log_norm = None
        else:
            # Component-parallel fused path (flash-softmax decomposition):
            # the light ρ-kernel emits this shard's pre-softmax log ρ, the
            # normalizer logsumexps ACROSS the comp axis (one pmax + one
            # psum), and the heavy kernel consumes it as log_norm so its
            # responsibilities / local-KL rows / statistics are weighted
            # by the GLOBAL softmax. Autodiff composes exactly: the main
            # kernel's d/dθ at fixed log_norm plus the lse-path cotangent
            # through the ρ-kernel's custom VJP is the chain rule of the
            # true normalized objective.
            log_rho = combine_pallas.log_rho_fused(
                pot_h, pot_p, exp, interpret=_COMBINE_INTERPRET
            )
            log_norm = gmm.lse_over_components(log_rho, axis_comp)
        z, log_resp, mean, local_n, stats = combine_pallas.combine_fused(
            pot_h, pot_p, exp, eps, config.num_samples, scale=scale,
            interpret=_COMBINE_INTERPRET, log_norm=log_norm, seed=seed,
        )
        resp = jnp.exp(log_resp)
        loglik = _weighted_loglik_fn(config)(nn_params["decoder"], z, x, config)
        recon = scale * jnp.sum(resp * jnp.mean(loglik, axis=0))
        local = scale * jnp.sum(local_n)
        if axis_comp is not None:
            recon = jax.lax.psum(recon, axis_comp)
            local = jax.lax.psum(local, axis_comp)
        global_kl = gmm.kl_global(pgm_nat, prior_nat, axis_comp=axis_comp)
        return SvaeOutputs(
            elbo=recon - local - global_kl,
            recon=recon,
            local_kl=local,
            global_kl=global_kl,
            suff_stats=stats,
            # chol/cov/logdet stay inside the kernel by design; consumers
            # needing them (evaluation, plotting extras) use sin_combine.
            posterior=SinPosterior(
                mean=mean, prec_chol=None, cov=None, log_resp=log_resp,
                logdet_prec=None,
            ),
        )

    combine = sin_combine
    if config.remat_combine:
        combine = jax.checkpoint(
            lambda h, p, e: sin_combine(
                h, p, e, jitter=config.jitter, axis_comp=axis_comp
            ),
            static_argnums=(),
        )
        post = combine(pot_h, pot_p, exp)
    else:
        post = sin_combine(pot_h, pot_p, exp, jitter=config.jitter, axis_comp=axis_comp)
    resp = jnp.exp(post.log_resp)

    if config.recon_mode == "sampled":
        recon = scale * jnp.sum(
            _recon_sampled(nn_params["decoder"], post, x, key, config)
        )
    else:
        # Reconstruction: S samples per (n, k), decoder batched over S·N·K.
        z = sample_posterior(key, post, config.num_samples, eps=eps)  # (S,N,K,d)
        loglik = _weighted_loglik_fn(config)(nn_params["decoder"], z, x, config)
        recon_nk = jnp.mean(loglik, axis=0)  # (N, K)
        recon = scale * jnp.sum(resp * recon_nk)

    local = scale * jnp.sum(local_kl_term(post, exp))
    if axis_comp is not None:
        # Σ_k reductions completed across the component shards.
        recon = jax.lax.psum(recon, axis_comp)
        local = jax.lax.psum(local, axis_comp)
    global_kl = gmm.kl_global(pgm_nat, prior_nat, axis_comp=axis_comp)
    elbo = recon - local - global_kl

    # CVI sufficient statistics from the structured posterior moments (§9.5).
    ezz = post.cov + post.mean[..., :, None] * post.mean[..., None, :]
    stats = gmm.suff_stats_from_moments(resp, post.mean, ezz, scale=scale)

    return SvaeOutputs(
        elbo=elbo,
        recon=recon,
        local_kl=local,
        global_kl=global_kl,
        suff_stats=stats,
        posterior=post,
    )


def generate(
    nn_params: dict,
    pgm_nat: GmmNat,
    key: jax.Array,
    num_samples: int,
    config: SvaeConfig,
    sample_params: bool = False,
):
    """Generate data from the learned model: z ~ GMM posterior mixture,
    x ~ decoder(z). Returns (x_params_or_means, z, labels); for Bernoulli
    heads the returned x is the pixel probability map."""
    from svax.pgm import gmm as gmm_mod

    k_z, k_dec = jax.random.split(key)
    z, labels = gmm_mod.sample_generative(
        k_z, pgm_nat, num_samples, sample_params=sample_params
    )
    out = nets.decoder_apply(
        nn_params["decoder"], z, config.likelihood, config.activation,
        config.nn_precision,
    )
    if config.likelihood == "gaussian":
        mean, _ = out
        return mean, z, labels
    return jax.nn.sigmoid(out), z, labels


def init_params(
    key: jax.Array,
    input_dim: int,
    config: SvaeConfig,
    encoder_hidden=(50, 50),
    decoder_hidden=(50, 50),
    dtype=jnp.float32,
) -> dict:
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": nets.encoder_init(
            k_enc, input_dim, encoder_hidden, config.latent_dim, dtype=dtype,
            head=config.encoder_head,
        ),
        "decoder": nets.decoder_init(
            k_dec,
            config.latent_dim,
            decoder_hidden,
            input_dim,
            config.likelihood,
            dtype=dtype,
        ),
    }
