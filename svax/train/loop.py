"""Device-resident training loops (TPU-first, SURVEY.md §8 hard part #5).

On TPU the per-step host dispatch can dominate a sub-millisecond step, so
the benchmark/training hot path runs K steps inside ONE jitted
``lax.scan`` — data stays in HBM, the CVI update and Adam update fuse into
the same program, and the host only sees the final state plus stacked
metrics. This is the idiomatic XLA replacement for the reference's
``session.run`` per-step loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def make_scan_runner(step: Callable, num_steps: int) -> Callable:
    """Compile ``num_steps`` applications of ``step(state, batch, key)``.

    Returns runner(state, x, key) → (state, metrics-pytree stacked over
    steps). The same full batch is used each step (the reference's
    full-batch pinwheel regime); minibatching is handled by the caller
    passing a (num_steps, M, D) batch stack instead.
    """

    def body(carry, key):
        state, x = carry
        state, metrics = step(state, x, key)
        return (state, x), metrics

    @jax.jit
    def runner(state, x, key):
        keys = jax.random.split(key, num_steps)
        (state, _), metrics = jax.lax.scan(body, (state, x), keys)
        return state, metrics

    return runner


def augment_step(step: Callable, sigma: float) -> Callable:
    """Wrap ``step(state, xb, key)`` with input-noise augmentation.

    Each call splits the key and trains on ``xb + sigma·N(0, I)`` — the
    seed-robustness recipe (BASELINE.md seed table). ``sigma <= 0``
    returns ``step`` unchanged, so callers can wire the flag through
    unconditionally. Single definition for every consumer
    (train_svae CLI, seed_sweep, latent-contamination demo): the key
    discipline — split BEFORE the step, noise from the first half — is
    part of the recipe and must not drift between them.
    """
    if sigma <= 0.0:
        return step

    def wrapped(state, xb, key):
        k1, k2 = jax.random.split(key)
        return step(state, xb + sigma * jax.random.normal(k1, xb.shape,
                                                          xb.dtype), k2)

    return wrapped


def make_minibatch_scan_runner(step: Callable, num_steps: int) -> Callable:
    """Scan over a precomputed (num_steps, M, D) stack of minibatches."""

    def body(state, inp):
        xb, key = inp
        state, metrics = step(state, xb, key)
        return state, metrics

    @jax.jit
    def runner(state, batches, key):
        keys = jax.random.split(key, num_steps)
        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, metrics

    return runner


# --------------------------------------------------- megakernel engine


def megakernel_unsupported_reason(
    config,
    *,
    batch_full: bool,
    encoder_hidden,
    decoder_hidden,
    rho,
    data_parallel: bool = False,
    component_shards: int = 1,
    aug_noise: float = 0.0,
    weight_decay: float = 0.0,
    input_dim: int = 0,
    rho_decay: float = 0.0,
) -> str | None:
    """Why no SVAE megakernel can run this workload (None = one can).

    Two whole-train-step kernels share the engine: ``tinystep_pallas``
    (the headline pinwheel class — d=2, full batch, constant ρ;
    input-noise augmentation runs in-kernel via the hardware PRNG) and
    ``flexstep_pallas`` (small-d minibatch class —
    d_in ≤ 8, latent d ≤ 6, Gaussian likelihood, 2-hidden tanh MLPs,
    constant-or-inverse-decay ρ, minibatch/augmentation via the streamed
    batch stack; ``input_dim`` must be given for it to be considered).
    Training-harness features neither kernel implements are rejected with
    a human-readable reason so CLIs/Trainers gate loudly instead of
    silently changing semantics.
    """
    from svax.ops import flexstep_pallas as fsp
    from svax.ops import tinystep_pallas as tsp

    if data_parallel or component_shards > 1:
        return "megakernel is single-device (no data/component sharding)"
    if weight_decay > 0.0:
        return "megakernel implements plain Adam only (no weight decay)"
    tiny_ok = (
        rho_decay == 0.0
        and tsp.supported(
            config,
            batch_full=batch_full,
            encoder_hidden=tuple(encoder_hidden),
            decoder_hidden=tuple(decoder_hidden),
            rho=rho,
        )
    )
    # flexstep implements the GMM prior only; tinystep additionally owns
    # the SMM (Student-t prior) u–z rounds behind its dof switch.
    flex_ok = (
        getattr(config, "dof", 0.0) == 0.0
        and input_dim > 0
        and (rho_decay > 0.0 or not callable(rho))
        and fsp.supported(
            config,
            d_in=input_dim,
            encoder_hidden=tuple(encoder_hidden),
            decoder_hidden=tuple(decoder_hidden),
        )
    )
    if tiny_ok or flex_ok:
        return None
    return (
        "outside both megakernel shape classes (both: diagonal recognition "
        "head only; tinystep: latent d=2, "
        "Gaussian likelihood, weighted recon, matched 2-hidden-layer MLPs, "
        "full batch, constant rho, zero jitter, GMM or SMM prior, "
        "in-kernel input-noise augmentation; flexstep: GMM prior, "
        "Gaussian likelihood, weighted recon, 2-hidden tanh MLPs, "
        "d_in<=8, latent d<=6, constant or 1/(1+decay*t) rho, "
        "augmentation on the streamed batch stack)"
    )


def make_megakernel_runner(
    config,
    prior,
    *,
    lr: float,
    rho: float,
    rho_decay: float = 0.0,
    batch_size: int = 0,
    aug_noise: float = 0.0,
    encoder_hidden=None,
    decoder_hidden=None,
    interpret: bool | None = None,
    force_flex: bool = False,
) -> Callable:
    """Chunk runner driving a whole-train-step Pallas megakernel.

    Returns ``runner(state, x, t_steps, seed=0) → (state, metrics)`` —
    semantically T steps of ``svae_step.make_train_step`` (oracle
    contracts in tests/test_tinystep_kernel.py and
    tests/test_flexstep_kernel.py), executed as ONE kernel launch with
    params/Adam/naturals VMEM-resident throughout. ``rho`` is the float
    ρ₀ (the schedule ρ₀/(1+decay·t) is computed in-kernel when
    ``rho_decay > 0``). Two kernels share this interface: the headline
    ``tinystep`` kernel when the workload is full-batch d=2 with constant
    ρ (input-noise augmentation runs IN-kernel — one extra hardware-PRNG
    draw perturbs the resident data plane per step), else the generalized
    ``flexstep`` kernel (minibatch sampling and augmentation happen on
    the streamed batch stack outside the kernel; ``force_flex`` pins it
    for A/B benches).

    Metric parity with the XLA step: per-step ``recon``/``local_kl`` are
    exact; ``global_kl`` is evaluated once at the post-chunk naturals
    (the kernel does not emit it per step) and broadcast, so ``elbo`` is
    exact on the LAST row — the only row the Trainer/CLI log — and
    approximate (one chunk stale in its global term) on earlier rows.

    Off-TPU (``interpret=None`` auto-detects) the kernel runs through the
    Pallas interpreter with host-generated eps — the hardware PRNG does
    not lower there — which keeps the path testable in CPU CI.
    """
    from svax.ops import flexstep_pallas as fsp
    from svax.ops import tinystep_pallas as tsp
    from svax.pgm import gmm

    if getattr(config, "encoder_head", "diag") != "diag":
        raise ValueError(
            "megakernels implement the diagonal recognition head only "
            "(encoder_head='diag'); the full-covariance head runs on the "
            "XLA engine — check megakernel_unsupported_reason before "
            "building the runner"
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    # Mosaic has no bf16x3 HIGH: DEFAULT stays single-pass bf16, anything
    # else gets the parity-class HIGHEST (full f32) dots.
    precision = (
        jax.lax.Precision.DEFAULT
        if config.nn_precision == jax.lax.Precision.DEFAULT
        else jax.lax.Precision.HIGHEST
    )
    kl_global = jax.jit(lambda nat: gmm.kl_global(nat, prior))

    use_tiny = (
        batch_size == 0
        and rho_decay == 0.0
        and not force_flex
        and (
            encoder_hidden is None
            or tsp.supported(
                config,
                batch_full=True,
                encoder_hidden=tuple(encoder_hidden),
                decoder_hidden=tuple(decoder_hidden),
                rho=rho,
            )
        )
    )

    def finish(state, mets, t_steps):
        gkl = kl_global(state.pgm_nat)
        mets = dict(mets)
        mets["global_kl"] = jnp.full((t_steps,), gkl)
        mets["elbo"] = mets["recon"] - mets["local_kl"] - mets["global_kl"]
        mets.setdefault("rho", jnp.full((t_steps,), rho))
        del mets["neg_loss"]
        return state, mets

    if use_tiny:

        def runner(state, x, t_steps: int, seed: int = 0):
            eps = aug_eps = None
            if interpret:
                k_eps = jax.random.fold_in(
                    jax.random.PRNGKey(seed), state.step.astype(jnp.int32)
                )
                n = x.shape[0]
                eps = jax.random.normal(
                    k_eps,
                    (t_steps, config.num_samples, n, config.num_components,
                     config.latent_dim),
                    jnp.float32,
                )
                if aug_noise > 0.0:
                    aug_eps = jax.random.normal(
                        jax.random.fold_in(k_eps, 7),
                        (t_steps, n, x.shape[1]), jnp.float32,
                    )
            state, mets = tsp.train_chunk(
                state, prior, x, lr=lr, rho=rho, t_steps=t_steps,
                num_samples=config.num_samples, seed=seed, eps=eps,
                interpret=interpret, precision=precision,
                dof=getattr(config, "dof", 0.0),
                smm_iters=getattr(config, "smm_iters", 2),
                smm_envelope_grads=getattr(
                    config, "smm_envelope_grads", False
                ),
                aug_noise=aug_noise, aug_eps=aug_eps,
            )
            return finish(state, mets, t_steps)

        return runner

    if getattr(config, "dof", 0.0) > 0.0:
        raise ValueError(
            "flexstep implements the GMM prior only — the SMM (dof > 0) "
            "megakernel path needs the tinystep shape class (full batch, "
            "no augmentation, constant rho); check "
            "megakernel_unsupported_reason before building the runner"
        )

    def runner(state, x, t_steps: int, seed: int = 0):
        n = x.shape[0]
        m = min(batch_size or n, n)
        key = jax.random.fold_in(
            jax.random.PRNGKey(seed), state.step.astype(jnp.int32)
        )
        kb, ka, ke = jax.random.split(key, 3)
        if m >= n:
            batches = jnp.broadcast_to(
                x.astype(jnp.float32), (t_steps,) + x.shape
            )
        else:
            idx = jax.random.randint(kb, (t_steps, m), 0, n)
            batches = x[idx].astype(jnp.float32)
        if aug_noise > 0.0:
            batches = batches + aug_noise * jax.random.normal(
                ka, batches.shape, batches.dtype
            )
        eps = None
        if interpret:
            eps = jax.random.normal(
                ke,
                (t_steps, config.num_samples, m, config.num_components,
                 config.latent_dim),
                jnp.float32,
            )
        state, mets = fsp.train_chunk(
            state, prior, batches, lr=lr, rho=rho, rho_decay=rho_decay,
            num_total=n, num_samples=config.num_samples, seed=seed,
            eps=eps, interpret=interpret, precision=precision,
        )
        return finish(state, mets, t_steps)

    return runner


def mixture_megakernel_unsupported_reason(
    *,
    data_dim: int,
    batch_full: bool,
    rho,
    data_parallel: bool = False,
    component_shards: int = 1,
) -> str | None:
    """Why the mixture megakernel cannot run this workload (None = it can).

    Gate for the GMM/SMM whole-train-step kernel
    (svax/ops/mixstep_pallas.py) — same contract shape as
    ``megakernel_unsupported_reason`` above.
    """
    from svax.ops import mixstep_pallas as msp

    if data_parallel or component_shards > 1:
        return "megakernel is single-device (no data/component sharding)"
    if not msp.supported(data_dim=data_dim, batch_full=batch_full, rho=rho):
        return (
            "outside the mixture-megakernel shape class (needs 2-D data, "
            "full batch, constant rho)"
        )
    return None


def make_mixture_megakernel_runner(
    prior,
    *,
    rho: float,
    dof: float = 0.0,
    interpret: bool | None = None,
    unroll: int = 1,
) -> Callable:
    """Chunk runner driving the GMM/SMM whole-train-step Pallas kernel.

    Returns ``runner(state, x, t_steps, seed=0) → (state, metrics)`` —
    semantically T steps of ``gmm_baseline.make_train_step`` (``dof=0``)
    or ``smm_baseline.make_train_step`` on the full batch (oracle contract
    in tests/test_mixstep_kernel.py), executed as ONE kernel launch with
    the naturals VMEM-resident throughout. ``seed`` is accepted for engine
    interface parity and ignored (the mixture step is deterministic).

    Metric parity: per-step ``local_evidence`` is exact; ``elbo``'s global
    KL is evaluated once at the POST-chunk naturals (the XLA step logs it
    at each step's pre-update naturals), so logged elbo rows carry a
    global term up to one chunk fresher — identical at convergence, and
    the bound of a real parameter setting either way.

    ``unroll`` > 1 runs that many complete steps per grid iteration
    (mixstep_pallas.train_chunk): ~9% faster on the GMM at U=8 (1.11M
    steps/s, BASELINE.md headroom note) but each U compiles its own
    kernel body, so trajectories across different unrolls — and across
    chunk splits that change the clamped U — agree only to ~1e-6
    float-scheduling noise. Leave at 1 (the default) when the bit-exact
    chunk-split/resume contract matters.
    """
    from svax.ops import mixstep_pallas as msp
    from svax.pgm import gmm

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kl_global = jax.jit(lambda nat: gmm.kl_global(nat, prior))

    def runner(state, x, t_steps: int, seed: int = 0):
        del seed
        state, mets = msp.train_chunk(
            state, prior, x, rho=rho, t_steps=t_steps, dof=dof,
            interpret=interpret, unroll=unroll,
        )
        gkl = kl_global(state.nat)
        mets = dict(mets)
        mets["elbo"] = mets["local_evidence"] - gkl
        mets["rho"] = jnp.full((t_steps,), rho)
        return state, mets

    return runner
