"""Whole-train-step Pallas megakernel for the pure-mixture baselines.

The pinwheel GMM/SMM workloads (BASELINE config #2; SURVEY.md §4.2 call
stack) are in the same op-count-bound regime the SVAE headline escaped
via ``tinystep_pallas``: at N=400, K=10, d=2 one CVI step is a handful of
microseconds of VPU math, so the XLA scan's per-step kernel launches —
not compute — set the measured 77 µs/step floor. This kernel removes the
op count the same way: ONE Pallas program runs T complete E-step → stats
→ CVI natural-gradient steps per launch over a ``grid=(T,)`` with the
(K_pad, 128) packed naturals block VMEM-resident throughout. There is no
NN, no Adam, no sampling and no RNG here — each grid step is pure
closed-form plane math (§9.2/§9.5 via the shared tinystep helpers).

Covers BOTH conjugate mixtures behind one ``dof`` switch:

* ``dof = 0``  — GMM: log ρ_nk per SURVEY §4.2, count-weighted stats;
* ``dof > 0``  — Student-t mixture via Gamma scale augmentation
  (svax/pgm/smm.py): b_nk = dof/2 + ½·quad, E[u] = a/b_nk, u-weighted
  Δη₁/Δη₂/Δη₃ with count-weighted Δη₄/Dirichlet. The constant
  a₀·log b₀ + lnΓ(a) − lnΓ(a₀) is folded in at trace time with
  ``math.lgamma`` (a, a₀ are static), so no in-kernel lgamma is needed.

Layouts mirror tinystep_pallas: data transposed to an (8, N_pad) plane
(d=2 rows live on sublanes 0–1), per-(n,k) quantities on (K_pad, N_pad)
planes with K on sublanes, naturals/prior/stats in (K_pad, 128) slot
blocks. Scope gate: d=2 observed data, full batch, single device,
constant ρ — everything else stays on the XLA path.

Oracle: tests/test_mixstep_kernel.py runs this kernel in interpret mode
against explicit loops of ``gmm_baseline.make_train_step`` /
``smm_baseline.make_train_step`` (naturals trajectories + metrics).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from svax.ops.tinystep_pallas import (
    _NEG,
    _LOG_2PI,
    _expected_cols,
    _pack_nat_block,
    _round_up,
    _unpack_nat_block,
)


def _make_kernel(*, geom, rho, scale, dof, unroll):
    from jax.experimental import pallas as pl

    k_pad, n_pad = geom["k_pad"], geom["n_pad"]
    n_real, num_k = geom["n"], geom["k"]

    if dof > 0.0:
        a0 = 0.5 * dof
        a = a0 + 1.0  # a₀ + d/2 at d = 2
        smm_const = a0 * math.log(a0) + math.lgamma(a) - math.lgamma(a0)

    def kernel(x_ref, prior_ref, nat0_ref, nat_ref, met_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            nat_ref[:] = nat0_ref[:]

        n_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1) < n_real
        ).astype(jnp.float32)
        k_maskc = (
            jax.lax.broadcasted_iota(jnp.int32, (k_pad, 1), 0) < num_k
        ).astype(jnp.float32)

        x1 = x_ref[0:1, :]  # (1, N_pad)
        x2 = x_ref[1:2, :]
        prior = prior_ref[:]

        def step(nat):
            """One complete E-step → stats → CVI update on the block."""
            exp = _expected_cols(nat, k_maskc, num_k)
            # E[(x−μ_k)ᵀΛ_k(x−μ_k)] on (K_pad, N_pad) planes
            # (smm._quad_form).
            quad = (
                exp["prec11"] * x1 * x1
                + 2.0 * exp["prec12"] * x1 * x2
                + exp["prec22"] * x2 * x2
                - 2.0 * (exp["pm1"] * x1 + exp["pm2"] * x2)
                + exp["quad"]
            )
            base = exp["log_pi"] + 0.5 * exp["logdet"] - _LOG_2PI
            if dof > 0.0:
                b = a0 + 0.5 * quad
                log_rho = base + smm_const - a * jnp.log(b)
                e_u = a / b
            else:
                log_rho = base - 0.5 * quad
            log_rho = jnp.where(k_maskc > 0.0, log_rho, _NEG)
            row_max = jnp.max(log_rho, axis=0, keepdims=True)
            evidence = row_max + jnp.log(
                jnp.sum(jnp.exp(log_rho - row_max), axis=0, keepdims=True)
            )  # (1, N_pad) per-point lse_k log ρ
            rm = jnp.exp(log_rho - evidence) * n_mask  # (K_pad, N_pad)

            w = rm * e_u if dof > 0.0 else rm  # u-weighted moments (SMM)
            rsum = lambda p: jnp.sum(p, axis=1, keepdims=True)  # noqa: E731
            counts = rsum(rm)  # (K_pad, 1)
            s1_1 = rsum(w * x1)
            s1_2 = rsum(w * x2)
            s2_11 = rsum(w * x1 * x1)
            s2_12 = rsum(w * x1 * x2)
            s2_22 = rsum(w * x2 * x2)
            eta2 = rsum(w) if dof > 0.0 else counts  # Δη₂ = Σ r E[u]

            # CVI update η ← (1−ρ)η + ρ(η₀ + scale·Δ) on the packed block.
            zcol = jnp.zeros_like(counts)
            delta = jnp.concatenate(
                [counts, s1_1, s1_2, eta2, s2_11, s2_12, s2_12, s2_22,
                 counts] + [zcol] * (128 - 9),
                axis=1,
            )
            new_nat = (1.0 - rho) * nat + rho * (prior + scale * delta)
            local = scale * jnp.sum(evidence * n_mask)
            return new_nat, local

        # U complete steps per grid iteration: the naturals stay in
        # registers between unrolled steps, so the per-grid-iteration
        # issue/loop overhead (the measured ~1 µs floor at U=1 — see
        # BASELINE.md's mixstep headroom note) is paid once per U steps.
        r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slot0 = ((r_i == 0) & (c_i == 0)).astype(jnp.float32)
        nat = nat_ref[:]
        for u in range(unroll):
            nat, local = step(nat)
            # Metrics: slot 0 = scaled local evidence (gmm_baseline's
            # ``local_evidence``). Scatter is unsupported in Mosaic — mask.
            met_ref[u] = slot0 * local
        nat_ref[:] = nat

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("t_steps", "rho", "scale", "dof", "geom_key",
                     "interpret", "unroll"),
)
def _chunk_call(packed, t_steps, rho, scale, dof, geom_key, interpret,
                unroll):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    geom = dict(geom_key)
    k_pad, n_pad = geom["k_pad"], geom["n_pad"]
    kernel = _make_kernel(geom=geom, rho=rho, scale=scale, dof=dof,
                          unroll=unroll)
    fixed2 = lambda t: (0, 0)  # noqa: E731

    nat_spec = pl.BlockSpec((k_pad, 128), fixed2, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(t_steps // unroll,),
        in_specs=[
            pl.BlockSpec((8, n_pad), fixed2, memory_space=pltpu.VMEM),
            nat_spec,
            nat_spec,
        ],
        out_specs=(
            nat_spec,
            pl.BlockSpec((unroll, 8, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((t_steps, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(packed["x_t"], packed["prior"], packed["nat"])
    return outs


def supported(*, data_dim: int, batch_full: bool, rho) -> bool:
    """Gate: the shape class this kernel is built for (module docstring)."""
    return data_dim == 2 and batch_full and not callable(rho)


def train_chunk(state, prior, x: jnp.ndarray, *, rho: float, t_steps: int,
                num_total: int | None = None, dof: float = 0.0,
                interpret: bool = False, unroll: int = 1):
    """Run T complete mixture CVI steps in one kernel launch.

    Semantically equivalent to T iterations of
    ``gmm_baseline.make_train_step(prior, rho, num_total)`` (``dof = 0``)
    or ``smm_baseline.make_train_step(..., dof=dof)`` (``dof > 0``) on the
    full batch — oracle-tested in tests/test_mixstep_kernel.py. Returns
    ``(new_state, metrics)`` where ``state`` is a GmmTrainState /
    SmmTrainState (anything with ``nat``/``step`` and ``_replace``) and
    metrics holds the per-step ``local_evidence`` (T,) array. The full
    ELBO needs the global KL — evaluate ``gmm.kl_global`` outside at
    whichever naturals the caller logs (it never feeds back into the
    step: CVI is statistics-driven).

    ``unroll`` = complete steps per grid iteration (clamped to the largest
    divisor of ``t_steps`` ≤ the request). The step math and its order
    are the same at every unroll, but the compiler schedules each U's
    body independently, so results across DIFFERENT unrolls agree only
    to float-scheduling noise (~1e-6 rel). The default is therefore
    U=1: it keeps the bit-exact chunk-split/resume contract (one 8-step
    launch == two 4-step launches, tests/test_checkpoint.py) that the
    checkpoint story relies on. U=8 is the opt-in throughput setting —
    measured on v5e (bench_mixstep.py, T=20000 paired-chunk marginals):
    GMM 0.988 → 0.902 µs/step (−9%, 1.11M steps/s), SMM neutral (1.075
    → 1.084) — the ~1 µs floor is the serial dependent-op issue chain
    of the step itself, so unrolling only removes the small
    per-grid-iteration loop overhead.
    """
    n, d = x.shape
    if num_total is None:
        num_total = n
    u = max(1, min(int(unroll), int(t_steps)))
    while t_steps % u:
        u -= 1
    geom = dict(n=n, n_pad=_round_up(n, 128), k=prior.dir_nat.shape[0],
                k_pad=_round_up(prior.dir_nat.shape[0], 8))
    return _train_chunk_jit(
        state, prior, x, tuple(sorted(geom.items())), int(t_steps),
        float(rho), float(num_total) / float(n), float(dof), interpret, u,
    )


@functools.partial(
    jax.jit,
    static_argnames=("geom_key", "t_steps", "rho", "scale", "dof",
                     "interpret", "unroll"),
)
def _train_chunk_jit(state, prior, x, geom_key, t_steps, rho, scale, dof,
                     interpret, unroll):
    geom = dict(geom_key)
    d = x.shape[1]
    packed = {
        "x_t": jnp.pad(jnp.asarray(x, jnp.float32).T,
                       ((0, 8 - d), (0, geom["n_pad"] - x.shape[0]))),
        "prior": _pack_nat_block(prior, geom),
        "nat": _pack_nat_block(state.nat, geom),
    }
    nat_block, metrics = _chunk_call(
        packed, t_steps, rho, scale, dof, geom_key, interpret, unroll
    )
    new_state = state._replace(
        nat=_unpack_nat_block(nat_block, geom),
        step=state.step + t_steps,
    )
    return new_state, {"local_evidence": metrics[:, 0, 0]}
