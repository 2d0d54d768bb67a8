"""Whole-train-step Pallas megakernel for the tiny pinwheel geometry.

The headline pinwheel config (N=400, K=10, d=2, S=4, MLPs 50-50) is
op-count bound: the XLA step compiles to ~155 tiny kernels whose launch
gaps — not compute — set the 113 µs/step floor measured in round 2
(docs/DESIGN.md §3b); the big-K Pallas kernels lose here to fixed
overheads and K→16 padding. This kernel removes the op count instead:
ONE Pallas program runs T complete training steps per launch with every
piece of state (NN params, Adam moments, PGM naturals) VMEM-resident
across a ``grid=(T,)`` — per-step launch overhead amortizes to ~zero and
the whole model (~100 KB) never touches HBM between steps.

Each grid step executes, entirely in VMEM:
  encoder fwd → SIN combine (closed-form 2×2 Cholesky/solve, §9.4)
  → reparam sampling → Gaussian-MLP decoder over S·N·K rows → structured
  ELBO pieces → ``jax.vjp`` backward for the NN gradient → Adam update →
  CVI natural-gradient update of the PGM naturals (§9.5), including the
  Dirichlet/NIW expected-parameter maps (digamma via an unrolled
  recurrence + asymptotic series — Mosaic has no digamma).

Layouts (all 2-D, no reshapes anywhere):
  * combine quantities are (K_pad, N_pad) planes — K on sublanes
    (8-padded), the batch on lanes (128-multiple); per-k scalars are
    (K_pad, 1) columns broadcast along lanes;
  * decoder activations form ONE (features, K·S·N_pad) block — all
    K components and S samples lane-concatenated so the whole decoder
    (fwd and vjp) is a single deep 3-dot chain;
  * params are stored transposed (out, in) with Adam m/v stacked under
    the param on the sublane axis: one (3·rows, cols) ref per tensor.
  * PGM naturals/prior/stats pack into (K_pad, 128) slot blocks
    (lanes: dir_nat, η₁(2), η₂, η₃(4), η₄).

Noise: ε can be streamed per step (tests inject it to match the XLA
oracle exactly) or generated in-kernel from the hardware PRNG
(``pltpu.prng_random_bits`` + Box–Muller) — the production mode, since
generating T·S·N·K·d normals with XLA outside would cost more than the
whole step. Gradients/updates are identical either way. The shipped
seed-robustness recipe's input-noise augmentation (``aug_noise``,
BASELINE.md seed table) runs in-kernel the same way: one extra
(8, N_pad) Box–Muller draw per grid step perturbs the resident data
plane (x + σ·ξ), so the quality recipe and the headline throughput
describe the SAME trainer (VERDICT r3 item 1).

Scope gate (the headline config's shape class): latent d=2, Gaussian
likelihood, tanh MLPs with exactly two hidden layers, full batch,
single device, constant ρ. Everything else falls back to the XLA path.
``dof > 0`` switches the combine to the Student-t-prior (SMM) u–z
coordinate rounds of svax.models.svae_smm — pure extra VPU plane math
(E[u]-scaled 2×2 solves + the Gamma free-energy terms; the lgamma/ψ
constants are evaluated at trace time) behind the same grid.

Oracle: tests/test_tinystep_kernel.py runs this kernel in interpret mode
against ``svax.train.svae_step.make_train_step`` (values, updated state,
multi-step trajectories) at matched ε.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from svax.pgm.gmm import GmmNat
from svax.expfam.niw import NiwNat

_LOG_2PI = 1.8378770664093453
_LOG_2 = 0.6931471805599453
_VAR_FLOOR = 1e-6
_NEG = -1e30
_B1, _B2, _ADAM_EPS = 0.9, 0.999, 1e-8


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# ----------------------------------------------------------- in-kernel math


def _digamma(x):
    """ψ(x) for x > 0: 8-step recurrence into the asymptotic series.

    ψ(x) = ψ(x+8) − Σ_{i=0..7} 1/(x+i); at y ≥ 8 the series
    ln y − 1/(2y) − 1/(12y²) + 1/(120y⁴) − 1/(252y⁶) is ~1e-9 accurate —
    far inside f32 noise. Mosaic has no digamma primitive.
    """
    acc = jnp.zeros_like(x)
    for i in range(8):
        acc = acc + 1.0 / (x + float(i))
    y = x + 8.0
    inv = 1.0 / y
    inv2 = inv * inv
    series = (
        jnp.log(y)
        - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
    )
    return series - acc


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _digamma_host(x: float) -> float:
    """Python-float ψ(x), same recurrence+series as ``_digamma`` above.

    The SMM branch needs ψ at the (compile-time constant) Gamma shapes
    a₀ and a = a₀ + d/2 only — evaluated at trace time so the kernel
    never computes it."""
    acc = 0.0
    for i in range(8):
        acc += 1.0 / (x + i)
    y = x + 8.0
    inv = 1.0 / y
    inv2 = inv * inv
    return (
        math.log(y)
        - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
        - acc
    )


def _expected_cols(nat, k_mask, num_k: int):
    """Expected GMM params from the packed naturals block (K_pad, 128).

    Returns (K_pad, 1) columns; padded component rows carry safe values
    and are excluded from the Dirichlet normalizer by ``k_mask``.
    Mirrors gmm.expected_params / niw.expected_stats for d=2 (SURVEY §9.2).
    """
    col = lambda i: nat[:, i : i + 1]  # noqa: E731
    alpha = col(0) + 1.0
    sum_alpha = jnp.sum(alpha * k_mask)
    e_log_pi = _digamma(alpha) - _digamma(
        jnp.full_like(alpha, 1.0) * sum_alpha
    )
    kappa = col(3)
    m1 = col(1) / kappa
    m2 = col(2) / kappa
    phi11 = col(4) - kappa * m1 * m1
    phi12 = col(5) - kappa * m1 * m2
    phi22 = col(7) - kappa * m2 * m2
    nu = col(8) - 4.0  # d + 2 = 4
    det = phi11 * phi22 - phi12 * phi12
    i11 = phi22 / det
    i12 = -phi12 / det
    i22 = phi11 / det
    pim1 = i11 * m1 + i12 * m2
    pim2 = i12 * m1 + i22 * m2
    return dict(
        log_pi=e_log_pi,
        prec11=nu * i11,
        prec12=nu * i12,
        prec22=nu * i22,
        pm1=nu * pim1,
        pm2=nu * pim2,
        quad=2.0 / kappa + nu * (m1 * pim1 + m2 * pim2),
        logdet=_digamma(nu / 2.0)
        + _digamma((nu - 1.0) / 2.0)
        + 2.0 * _LOG_2
        - jnp.log(det),
    )


def _mlp3(p, h, precision):
    """tanh-tanh-linear MLP in (features, rows) layout.

    Default-precision MXU passes truncate inputs to single-pass bf16 and
    were measured at ~0.2–0.9% gradient error vs the XLA oracle on
    hardware; HIGHEST (full f32) restored parity to ~2e-5. Mosaic rejects
    HIGH (the oracle's bf16x3 NN precision), so HIGHEST is the only
    parity-class choice in-kernel; this step is not MXU-bound, so the
    extra passes are cheap.
    """
    f32 = jnp.float32
    h = jnp.tanh(
        jnp.dot(p["w1t"], h, preferred_element_type=f32,
                precision=precision) + p["b1"]
    )
    h = jnp.tanh(
        jnp.dot(p["w2t"], h, preferred_element_type=f32,
                precision=precision) + p["b2"]
    )
    return (
        jnp.dot(p["w3t"], h, preferred_element_type=f32,
                precision=precision) + p["b3"]
    )


def _step_math(nn, exp, x_t, xs_t, eps, n_mask, k_maskc, *, geom):
    """One full forward: returns (neg_loss, aux) — the vjp target.

    nn: dict of 12 padded plane tensors (enc/dec w1t,b1,w2t,b2,w3t,b3).
    exp: expected-param columns (non-diff closure). x_t (d_in_pad, N_pad);
    xs_t (d_in_pad, K·S·N_pad) the K·S-lane-tiled copy; eps (S·2·K_pad, N_pad);
    n_mask (1, N_pad); k_maskc (K_pad, 1).
    """
    d_lat, num_k, k_pad, s, n_pad, num_total = (
        geom["d_lat"], geom["k"], geom["k_pad"], geom["s"], geom["n_pad"],
        geom["num_total"],
    )
    precision = geom["precision"]
    enc = {k[4:]: v for k, v in nn.items() if k.startswith("enc_")}
    dec = {k[4:]: v for k, v in nn.items() if k.startswith("dec_")}

    # Encoder → diagonal Gaussian potential (nets.encoder_apply).
    out = _mlp3(enc, x_t, precision)  # (8, N_pad): [mean(2), raw(2), pad]
    var1 = _softplus(out[2:3, :]) + _VAR_FLOOR
    var2 = _softplus(out[3:4, :]) + _VAR_FLOOR
    p1 = 1.0 / var1  # (1, N_pad)
    p2 = 1.0 / var2
    h1 = out[0:1, :] * p1
    h2 = out[1:2, :] * p2

    # SIN combine (§9.4), closed-form 2×2, on (K_pad, N_pad) planes.
    # ``dof > 0`` switches to the u-augmented Student-t-prior combine
    # (svae_smm.smm_combine): ū-scaled component messages, smm_iters u–z
    # coordinate rounds, and a final z-update so q(z) is optimal for the
    # final q(u). ū = 1.0 reproduces the GMM combine bit-for-bit.
    dof = geom["dof"]

    def z_planes(e_u):
        j11 = e_u * exp["prec11"] + p1  # (K_pad, N_pad) via broadcast
        j12 = e_u * exp["prec12"] + jnp.zeros_like(j11)
        j22 = e_u * exp["prec22"] + p2
        ht1 = e_u * exp["pm1"] + h1
        ht2 = e_u * exp["pm2"] + h2
        det = j11 * j22 - j12 * j12
        s11 = j22 / det
        s12 = -j12 / det
        s22 = j11 / det
        mu1 = s11 * ht1 + s12 * ht2
        mu2 = s12 * ht1 + s22 * ht2
        return j11, j12, j22, ht1, ht2, det, s11, s12, s22, mu1, mu2

    def quad_latent(s11, s12, s22, mu1, mu2):
        # Q_nk = E[(z−μ_k)ᵀΛ_k(z−μ_k)] (svae_smm._quad_latent, d=2).
        return (
            exp["prec11"] * (s11 + mu1 * mu1)
            + 2.0 * exp["prec12"] * (s12 + mu1 * mu2)
            + exp["prec22"] * (s22 + mu2 * mu2)
            - 2.0 * (exp["pm1"] * mu1 + exp["pm2"] * mu2)
            + exp["quad"]
        )

    if dof > 0.0:
        a0 = b0 = 0.5 * dof
        a = a0 + 1.0  # a₀ + d/2, d = 2
        lg_a, lg_a0 = math.lgamma(a), math.lgamma(a0)
        dg_a = _digamma_host(a)
        e_u = 1.0
        for _ in range(max(geom["smm_iters"], 1)):
            _, _, _, _, _, _, s11, s12, s22, mu1, mu2 = z_planes(e_u)
            gamma_b = b0 + 0.5 * quad_latent(s11, s12, s22, mu1, mu2)
            e_u = a / gamma_b
        if geom["smm_env"]:
            # Envelope theorem: q(u) is at its coordinate optimum, so the
            # cotangent through the u-rounds carries no signal.
            gamma_b = jax.lax.stop_gradient(gamma_b)
            e_u = a / gamma_b
        j11, j12, j22, ht1, ht2, det, s11, s12, s22, mu1, mu2 = z_planes(e_u)
        quad_f = quad_latent(s11, s12, s22, mu1, mu2)
        logdet_j = jnp.log(det)
        log_gb = jnp.log(gamma_b)
        e_log_u = dg_a - log_gb
        # −KL(q(u)‖p(u)) = E[log p(u)] + H[q(u)] (svae_smm.smm_combine).
        u_free = (
            a0 * math.log(b0)
            - lg_a0
            + (a0 - 1.0) * e_log_u
            - b0 * e_u
            + a
            - log_gb
            + lg_a
            + (1.0 - a) * dg_a
        )
        log_rho = (
            exp["log_pi"]
            + e_log_u  # 0.5·d·E[log u], d = 2
            - _LOG_2PI  # 0.5·d·log 2π
            + 0.5 * exp["logdet"]
            - 0.5 * e_u * exp["quad"]
            + 0.5 * (mu1 * ht1 + mu2 * ht2)
            - 0.5 * logdet_j
            + u_free
        )
    else:
        j11, j12, j22, ht1, ht2, det, s11, s12, s22, mu1, mu2 = z_planes(1.0)
        logdet_j = jnp.log(det)
        log_rho = (
            exp["log_pi"]
            + 0.5 * exp["logdet"]
            - 0.5 * exp["quad"]
            + 0.5 * (mu1 * ht1 + mu2 * ht2)
            - 0.5 * logdet_j
        )
    log_rho = jnp.where(k_maskc > 0.0, log_rho, _NEG)
    row_max = jnp.max(log_rho, axis=0, keepdims=True)
    log_se = jnp.log(
        jnp.sum(jnp.exp(log_rho - row_max), axis=0, keepdims=True)
    )
    log_resp = log_rho - (row_max + log_se)  # (K_pad, N_pad)
    resp = jnp.exp(log_resp)

    # Sampling: z = μ̃ + L̃⁻ᵀε with L̃ = chol(J̃) (svae.sample_posterior).
    l11 = jnp.sqrt(j11)
    l21 = j12 / l11
    l22 = jnp.sqrt(j22 - l21 * l21)
    z1s, z2s = [], []
    for si in range(s):
        e1 = eps[si * 2 * k_pad : si * 2 * k_pad + k_pad, :]
        e2 = eps[si * 2 * k_pad + k_pad : (si + 1) * 2 * k_pad, :]
        u2 = e2 / l22
        u1 = (e1 - l21 * u2) / l11
        z1s.append(mu1 + u1)
        z2s.append(mu2 + u2)

    # Decoder + recon: ONE (d_lat_pad, K·S·N_pad) block — a single deep
    # 3-dot chain instead of K skinny ones. The K-unrolled version cost
    # ~90 narrow dots per step through the vjp; this is 9 wide ones, and
    # the backward dW contractions get a K·S·N-deep reduction axis the
    # MXU can actually use. Rows are pulled off the (K_pad, N_pad) planes
    # by masked sublane reductions, not slices: Mosaic refuses to
    # lane-concat vectors whose sublane offsets differ ("offset mismatch
    # on non-concat dimension"), and a where+sum lands every row at the
    # canonical {0,0} offset.
    def _take_row(plane, ki):
        idx = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 0)
        return jnp.sum(
            jnp.where(idx == ki, plane, 0.0), axis=0, keepdims=True
        )

    zero_krow = jnp.zeros((1, num_k * s * n_pad), jnp.float32)
    z_row1 = jnp.concatenate(
        [_take_row(z1s[si], ki) for ki in range(num_k) for si in range(s)],
        axis=1,
    )  # (1, K·S·N_pad), lanes k-major then s then n
    z_row2 = jnp.concatenate(
        [_take_row(z2s[si], ki) for ki in range(num_k) for si in range(s)],
        axis=1,
    )
    z_all = jnp.concatenate(
        [z_row1, z_row2] + [zero_krow] * (geom["d_lat_pad"] - d_lat), axis=0
    )  # (d_lat_pad, K·S·N_pad)
    ok = _mlp3(dec, z_all, precision)  # (8, K·S·N_pad): [mean(2), raw(2)]
    var_a = _softplus(ok[2:3, :]) + _VAR_FLOOR
    var_b = _softplus(ok[3:4, :]) + _VAR_FLOOR
    ll = -0.5 * (
        jnp.log(var_a) + (xs_t[0:1, :] - ok[0:1, :]) ** 2 / var_a
        + jnp.log(var_b) + (xs_t[1:2, :] - ok[1:2, :]) ** 2 / var_b
        + 2.0 * _LOG_2PI
    )  # (1, K·S·N_pad); xs_t is the K·S-lane-tiled data (pack_state)
    r_all = jnp.concatenate(
        [_take_row(resp, ki) for ki in range(num_k) for _ in range(s)],
        axis=1,
    )
    nks_mask = jnp.concatenate([n_mask] * (num_k * s), axis=1)
    recon = jnp.sum(r_all * ll * nks_mask) / float(s)

    if dof > 0.0:
        # Local term Σ r̃ (A_nk − log r̃) with A the per-component free
        # energy (svae_smm.forward: valid bound for any r̃).
        e_log_pz = (
            e_log_u - _LOG_2PI + 0.5 * exp["logdet"] - 0.5 * e_u * quad_f
        )
        h_z = (1.0 + _LOG_2PI) - 0.5 * logdet_j  # 0.5·d·(1+log 2π), d=2
        free_energy = exp["log_pi"] + e_log_pz + h_z + u_free
        local = -jnp.sum(
            resp * (free_energy - log_resp) * (n_mask * k_maskc)
        )
    else:
        # Local KL (svae.local_kl_term), closed form on planes.
        g_k = 0.5 * exp["logdet"] - _LOG_2PI - 0.5 * exp["quad"]  # (d/2)=1
        cross = exp["pm1"] * mu1 + exp["pm2"] * mu2
        tr_term = exp["prec11"] * s11 + 2.0 * exp["prec12"] * s12 + (
            exp["prec22"] * s22
        )
        quad_mu = (
            exp["prec11"] * mu1 * mu1
            + 2.0 * exp["prec12"] * mu1 * mu2
            + exp["prec22"] * mu2 * mu2
        )
        e_log_pbar = exp["log_pi"] + g_k + cross - 0.5 * (tr_term + quad_mu)
        e_log_q = log_resp - (1.0 + _LOG_2PI) + 0.5 * logdet_j  # (d/2)=1
        local = -jnp.sum(
            resp * (e_log_pbar - e_log_q) * (n_mask * k_maskc)
        )

    # CVI sufficient statistics (§9.5) from the posterior moments. The SMM
    # prior weights the NIW moment stats by E[u] with the count increment
    # unweighted (smm.SmmSuffStats: Δη₂ = Σ r̃ū ≠ Δη₄ = Σ r̃).
    rm = resp * n_mask
    ru = rm * e_u if dof > 0.0 else rm
    counts = jnp.sum(rm, axis=1, keepdims=True)  # (K_pad, 1)
    u_counts = (
        jnp.sum(ru, axis=1, keepdims=True) if dof > 0.0 else counts
    )
    s1_1 = jnp.sum(ru * mu1, axis=1, keepdims=True)
    s1_2 = jnp.sum(ru * mu2, axis=1, keepdims=True)
    s2_11 = jnp.sum(ru * (s11 + mu1 * mu1), axis=1, keepdims=True)
    s2_12 = jnp.sum(ru * (s12 + mu1 * mu2), axis=1, keepdims=True)
    s2_22 = jnp.sum(ru * (s22 + mu2 * mu2), axis=1, keepdims=True)

    neg_loss = -(recon - local) / float(num_total)
    aux = (counts, u_counts, s1_1, s1_2, s2_11, s2_12, s2_22, recon, local)
    return neg_loss, aux


# -------------------------------------------------------------- the kernel


def _make_kernel(*, geom, lr, rho, t_steps, use_rng):
    from jax.experimental import pallas as pl

    k_pad, n_pad, s = geom["k_pad"], geom["n_pad"], geom["s"]
    n_real, num_k = geom["n"], geom["k"]
    names = geom["tensor_names"]
    rows = geom["tensor_rows"]

    aug = geom["aug"]

    def kernel(*refs):
        # inputs: scalars(SMEM), x, [xs], prior, [eps], [aug_eps],
        #         init×12, nat0   (xs only when aug == 0: with
        #         augmentation the K·S-tiled copy is rebuilt in-kernel
        #         from the perturbed plane each step)
        # outputs: state×12, nat, metrics
        idx = 0
        scal_ref = refs[idx]; idx += 1
        x_ref = refs[idx]; idx += 1
        xs_ref = None
        if aug == 0.0:
            xs_ref = refs[idx]; idx += 1
        prior_ref = refs[idx]; idx += 1
        eps_ref = aug_ref = None
        if not use_rng:
            eps_ref = refs[idx]; idx += 1
            if aug > 0.0:
                aug_ref = refs[idx]; idx += 1
        init_refs = refs[idx : idx + 12]; idx += 12
        nat0_ref = refs[idx]; idx += 1
        state_refs = refs[idx : idx + 12]; idx += 12
        nat_ref = refs[idx]; idx += 1
        met_ref = refs[idx]; idx += 1

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            for src, dst in zip(init_refs, state_refs):
                dst[:] = src[:]
            nat_ref[:] = nat0_ref[:]

        n_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1) < n_real
        ).astype(jnp.float32)
        k_maskc = (
            jax.lax.broadcasted_iota(jnp.int32, (k_pad, 1), 0) < num_k
        ).astype(jnp.float32)

        if use_rng:
            # Shared Box–Muller recipe (24-bit mask of the SIGNED int32
            # bits, +0.5 on u1 — the signed->>8 bug history lives on the
            # helper): one sub-block per train step, seeded (seed, t).
            from svax.ops.combine_pallas import _tile_prng_normals

            eps = _tile_prng_normals(
                scal_ref[0, 1], t, 1, s * 2 * k_pad, n_pad
            )
        else:
            eps = eps_ref[:]

        if aug > 0.0:
            # Input-noise augmentation x + σ·ξ on the resident plane —
            # an independent PRNG stream (base offset 2^30 keeps it off
            # the ε bases t < T). ξ is masked to the real input rows;
            # padded batch columns stay masked downstream as always.
            if use_rng:
                xi = _tile_prng_normals(
                    scal_ref[0, 1], t + (1 << 30), 1, geom["d_in_pad"],
                    n_pad,
                )
            else:
                xi = aug_ref[:]
            d_mask = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (geom["d_in_pad"], 1), 0
                )
                < geom["d_in"]
            ).astype(jnp.float32)
            x_t = x_ref[:] + jnp.float32(aug) * xi * d_mask
            tile_row = lambda i: jnp.concatenate(  # noqa: E731
                [x_t[i : i + 1, :]] * (num_k * s), axis=1
            )
            xs_t = jnp.concatenate([tile_row(0), tile_row(1)], axis=0)
        else:
            x_t = x_ref[:]
            xs_t = xs_ref[:]

        nn = {nm: state_refs[i][: rows[i], :] for i, nm in enumerate(names)}
        nat = nat_ref[:]
        exp = _expected_cols(nat, k_maskc, num_k)

        fn = functools.partial(
            _step_math, exp=exp, x_t=x_t, xs_t=xs_t, eps=eps,
            n_mask=n_mask, k_maskc=k_maskc, geom=geom,
        )
        (neg_loss, vjp, aux) = jax.vjp(fn, nn, has_aux=True)
        (grads,) = vjp(jnp.ones((), jnp.float32))
        counts, u_counts, s1_1, s1_2, s2_11, s2_12, s2_22, recon, local = aux

        # Adam (optax.adam defaults): m/v live stacked under each param.
        step_t = (scal_ref[0, 0] + t + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(step_t * jnp.log(jnp.float32(_B1)))
        bc2 = 1.0 - jnp.exp(step_t * jnp.log(jnp.float32(_B2)))
        for i, nm in enumerate(names):
            r = rows[i]
            ref = state_refs[i]
            g = grads[nm]
            m_new = _B1 * ref[r : 2 * r, :] + (1.0 - _B1) * g
            v_new = _B2 * ref[2 * r : 3 * r, :] + (1.0 - _B2) * g * g
            upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + _ADAM_EPS)
            ref[:r, :] = ref[:r, :] - lr * upd
            ref[r : 2 * r, :] = m_new
            ref[2 * r : 3 * r, :] = v_new

        # CVI update η ← (1−ρ)η + ρ(η₀ + Δ) on the packed block (§9.5).
        # Slot 3 (η₂) carries Σ r̃ū — identical to counts for the GMM.
        zcol = jnp.zeros_like(counts)
        delta = jnp.concatenate(
            [counts, s1_1, s1_2, u_counts, s2_11, s2_12, s2_12, s2_22,
             counts]
            + [zcol] * (128 - 9),
            axis=1,
        )
        nat_ref[:] = (1.0 - rho) * nat + rho * (prior_ref[:] + delta)

        # Scatter is unsupported in Mosaic — place the scalars with masks.
        r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slot = lambda j: ((r_i == 0) & (c_i == j)).astype(jnp.float32)  # noqa: E731
        met_ref[0] = (
            slot(0) * recon + slot(1) * local + slot(2) * neg_loss
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("t_steps", "lr", "rho", "geom_key", "interpret"),
)
def _chunk_call(packed, t_steps, lr, rho, geom_key, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    geom = dict(geom_key)
    geom["tensor_names"] = tuple(n for n, _ in geom_key_tensors(geom))
    geom["tensor_rows"] = tuple(r for _, (r, _) in geom_key_tensors(geom))
    k_pad, n_pad, s = geom["k_pad"], geom["n_pad"], geom["s"]
    use_rng = "eps" not in packed

    kernel = _make_kernel(
        geom=geom, lr=lr, rho=rho, t_steps=t_steps, use_rng=use_rng
    )
    fixed2 = lambda t: (0, 0)  # noqa: E731

    tensors = geom_key_tensors(geom)
    state_specs = [
        pl.BlockSpec((3 * r, c), fixed2, memory_space=pltpu.VMEM)
        for _, (r, c) in tensors
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars (1, 2) int32
        pl.BlockSpec((geom["d_in_pad"], n_pad), fixed2,
                     memory_space=pltpu.VMEM),
    ]
    inputs = [packed["scalars"], packed["x_t"]]
    if geom["aug"] == 0.0:
        in_specs.append(
            pl.BlockSpec((geom["d_in_pad"], geom["k"] * s * n_pad), fixed2,
                         memory_space=pltpu.VMEM)
        )
        inputs.append(packed["xs_t"])
    in_specs.append(pl.BlockSpec((k_pad, 128), fixed2,
                                 memory_space=pltpu.VMEM))
    inputs.append(packed["prior"])
    if not use_rng:
        in_specs.append(
            pl.BlockSpec((s * 2 * k_pad, n_pad), lambda t: (t, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(packed["eps"])
        if geom["aug"] > 0.0:
            in_specs.append(
                pl.BlockSpec((geom["d_in_pad"], n_pad), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(packed["aug_eps"])
    in_specs += state_specs
    inputs += [packed[nm] for nm, _ in tensors]
    in_specs.append(pl.BlockSpec((k_pad, 128), fixed2,
                                 memory_space=pltpu.VMEM))
    inputs.append(packed["nat"])

    out_specs = tuple(state_specs) + (
        pl.BlockSpec((k_pad, 128), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((3 * r, c), jnp.float32) for _, (r, c) in tensors
    ) + (
        jax.ShapeDtypeStruct((k_pad, 128), jnp.float32),
        jax.ShapeDtypeStruct((t_steps, 8, 128), jnp.float32),
    )

    outs = pl.pallas_call(
        kernel,
        grid=(t_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    new_packed = {nm: o for (nm, _), o in zip(tensors, outs[:12])}
    new_packed["nat"] = outs[12]
    return new_packed, outs[13]


# ----------------------------------------------------- packing / unpacking


def geom_key_tensors(geom):
    """(name, (rows, cols)) for the 12 stacked param+Adam tensors."""
    h1, h2 = geom["h1_pad"], geom["h2_pad"]
    di, dl = geom["d_in_pad"], geom["d_lat_pad"]
    return [
        ("enc_w1t", (h1, di)), ("enc_b1", (h1, 1)),
        ("enc_w2t", (h2, h1)), ("enc_b2", (h2, 1)),
        ("enc_w3t", (8, h2)), ("enc_b3", (8, 1)),
        ("dec_w1t", (h1, dl)), ("dec_b1", (h1, 1)),
        ("dec_w2t", (h2, h1)), ("dec_b2", (h2, 1)),
        ("dec_w3t", (8, h2)), ("dec_b3", (8, 1)),
    ]


def make_geom(*, n, d_in, d_lat, k, s, h1, h2, num_total,
              precision=jax.lax.Precision.HIGHEST, dof=0.0, smm_iters=2,
              smm_env=False, aug=0.0):
    assert d_in == 2 and d_lat == 2, "tinystep supports d_in = d_lat = 2"
    return dict(
        n=n, n_pad=_round_up(n, 128), d_in=d_in, d_in_pad=8,
        d_lat=d_lat, d_lat_pad=8, k=k, k_pad=_round_up(k, 8), s=s,
        h1_pad=_round_up(h1, 8), h2_pad=_round_up(h2, 8),
        num_total=num_total, precision=precision, dof=float(dof),
        smm_iters=int(smm_iters), smm_env=bool(smm_env), aug=float(aug),
    )


def _geom_key(geom):
    return tuple(sorted((k, v) for k, v in geom.items()))


def _pack_wt(w, rows, cols):
    wt = jnp.asarray(w, jnp.float32).T
    return jnp.pad(wt, ((0, rows - wt.shape[0]), (0, cols - wt.shape[1])))


def _pack_b(b, rows):
    return jnp.pad(jnp.asarray(b, jnp.float32)[:, None],
                   ((0, rows - b.shape[0]), (0, 0)))


def _pack_nat_block(nat: GmmNat, geom) -> jnp.ndarray:
    """GmmNat → (K_pad, 128) slot block; padded rows get SAFE naturals
    (α=1, κ=1, m=0, Φ=I, ν=d+1 → η = (0, 1, I, d+3)) so the in-kernel
    expected-parameter map stays finite on them."""
    k, k_pad = geom["k"], geom["k_pad"]
    f32 = jnp.float32
    cols = [
        jnp.asarray(nat.dir_nat, f32)[:, None],
        jnp.asarray(nat.niw_nat.eta1, f32),
        jnp.asarray(nat.niw_nat.eta2, f32)[:, None],
        jnp.asarray(nat.niw_nat.eta3, f32).reshape(k, 4),
        jnp.asarray(nat.niw_nat.eta4, f32)[:, None],
    ]
    block = jnp.concatenate(cols, axis=1)  # (k, 9)
    safe = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 7.0]], f32)
    block = jnp.concatenate(
        [block, jnp.broadcast_to(safe, (k_pad - k, 9))], axis=0
    )
    return jnp.pad(block, ((0, 0), (0, 128 - 9)))


def _unpack_nat_block(block: jnp.ndarray, geom) -> GmmNat:
    k = geom["k"]
    return GmmNat(
        dir_nat=block[:k, 0],
        niw_nat=NiwNat(
            eta1=block[:k, 1:3],
            eta2=block[:k, 3],
            eta3=block[:k, 4:8].reshape(k, 2, 2),
            eta4=block[:k, 8],
        ),
    )


def pack_state(state, prior: GmmNat, x: jnp.ndarray, geom,
               eps: jnp.ndarray | None = None, seed: int = 0,
               aug_eps: jnp.ndarray | None = None) -> dict:
    """SvaeTrainState + data → the kernel's padded plane dict.

    ``eps`` (T, S, N, K, d) switches the kernel to injected noise (tests);
    None uses the in-kernel hardware PRNG seeded by (seed, grid step);
    train_chunk folds state.step into the seed so consecutive chunks
    never replay the same stream. ``aug_eps`` (T, N, d_in) injects the
    augmentation noise the same way when ``geom['aug'] > 0``.
    """
    enc = state.nn_params["encoder"]
    dec = state.nn_params["decoder"]
    adam = state.opt_state[0]
    mu_e, mu_d = adam.mu["encoder"], adam.mu["decoder"]
    nu_e, nu_d = adam.nu["encoder"], adam.nu["decoder"]
    tensors = geom_key_tensors(geom)
    packed = {}
    layer_of = {"w1t": 0, "b1": 0, "w2t": 1, "b2": 1, "w3t": 2, "b3": 2}
    for nm, (rows, cols) in tensors:
        side, part = nm.split("_")
        params, mus, nus = (
            (enc, mu_e, nu_e) if side == "enc" else (dec, mu_d, nu_d)
        )
        li = layer_of[part]
        if part.startswith("w"):
            pk = lambda a: _pack_wt(a["w"], rows, cols)  # noqa: E731
        else:
            pk = lambda a: _pack_b(a["b"], rows)  # noqa: E731
        packed[nm] = jnp.concatenate(
            [pk(params[li]), pk(mus[li]), pk(nus[li])], axis=0
        )
    n, n_pad, s = geom["n"], geom["n_pad"], geom["s"]
    x_t = jnp.pad(jnp.asarray(x, jnp.float32).T,
                  ((0, geom["d_in_pad"] - geom["d_in"]), (0, n_pad - n)))
    packed["x_t"] = x_t
    if geom["aug"] == 0.0:
        # K·S lane-tiled data for the one-block decoder recon (k-major,
        # then s); with augmentation the kernel rebuilds this from the
        # perturbed plane each step instead.
        packed["xs_t"] = jnp.concatenate([x_t] * (geom["k"] * s), axis=1)
    packed["nat"] = _pack_nat_block(state.pgm_nat, geom)
    packed["prior"] = _pack_nat_block(prior, geom)
    packed["scalars"] = jnp.stack(
        [jnp.asarray(adam.count, jnp.int32),
         jnp.asarray(seed, jnp.int32)]
    )[None, :]
    if eps is not None:
        t_steps, k, k_pad = eps.shape[0], geom["k"], geom["k_pad"]
        # (T, S, N, K, d) → (T·S·2·K_pad, N_pad) plane rows (s, dim, k).
        e = jnp.transpose(jnp.asarray(eps, jnp.float32), (0, 1, 4, 3, 2))
        e = jnp.pad(e, ((0, 0), (0, 0), (0, 0), (0, k_pad - k),
                        (0, n_pad - n)))
        packed["eps"] = e.reshape(t_steps * s * 2 * k_pad, n_pad)
    if aug_eps is not None and geom["aug"] > 0.0:
        # (T, N, d_in) → (T·d_in_pad, N_pad) plane rows.
        t_steps = aug_eps.shape[0]
        a = jnp.transpose(jnp.asarray(aug_eps, jnp.float32), (0, 2, 1))
        a = jnp.pad(a, ((0, 0), (0, geom["d_in_pad"] - geom["d_in"]),
                        (0, n_pad - n)))
        packed["aug_eps"] = a.reshape(t_steps * geom["d_in_pad"], n_pad)
    return packed


def unpack_state(packed, metrics, state_template, geom, t_steps: int):
    """Kernel outputs → (SvaeTrainState, metrics dict of (T,) arrays)."""
    from svax.train.svae_step import SvaeTrainState

    tensors = dict(geom_key_tensors(geom))
    enc_t, dec_t = state_template.nn_params["encoder"], (
        state_template.nn_params["decoder"]
    )

    def unpack_side(side, template):
        layers = []
        for li, lname in enumerate(["1", "2", "3"]):
            wt_nm, b_nm = f"{side}_w{lname}t", f"{side}_b{lname}"
            w_shape = template[li]["w"].shape
            rows, _ = tensors[wt_nm]

            def cut(buf, which, rows=rows):
                return buf[which * rows : which * rows + rows]

            out = []
            for which in range(3):
                wt = cut(packed[wt_nm], which)
                b = cut(packed[b_nm], which)
                out.append(
                    {
                        "w": wt[: w_shape[1], : w_shape[0]].T,
                        "b": b[: template[li]["b"].shape[0], 0],
                    }
                )
            layers.append(out)
        params = [o[0] for o in layers]
        mus = [o[1] for o in layers]
        nus = [o[2] for o in layers]
        return params, mus, nus

    enc_p, enc_m, enc_v = unpack_side("enc", enc_t)
    dec_p, dec_m, dec_v = unpack_side("dec", dec_t)
    adam0 = state_template.opt_state[0]
    adam = adam0._replace(
        count=adam0.count + t_steps,
        mu={"encoder": enc_m, "decoder": dec_m},
        nu={"encoder": enc_v, "decoder": dec_v},
    )
    state = SvaeTrainState(
        nn_params={"encoder": enc_p, "decoder": dec_p},
        opt_state=(adam,) + tuple(state_template.opt_state[1:]),
        pgm_nat=_unpack_nat_block(packed["nat"], geom),
        step=state_template.step + t_steps,
    )
    mets = {
        "recon": metrics[:, 0, 0],
        "local_kl": metrics[:, 0, 1],
        "neg_loss": metrics[:, 0, 2],
    }
    return state, mets


# --------------------------------------------------------------- public API


def supported(config, *, batch_full: bool, encoder_hidden, decoder_hidden,
              rho) -> bool:
    """Gate: the shape class this kernel is built for."""
    return (
        config.latent_dim == 2
        and config.likelihood == "gaussian"
        and config.recon_mode == "weighted"
        and getattr(config, "encoder_head", "diag") == "diag"
        and len(encoder_hidden) == 2
        and len(decoder_hidden) == 2
        and encoder_hidden == decoder_hidden
        and batch_full
        and not callable(rho)
        and config.jitter == 0.0
    )


def train_chunk(state, prior: GmmNat, x: jnp.ndarray, *, lr: float,
                rho: float, t_steps: int, num_samples: int = 4,
                seed=0, eps: jnp.ndarray | None = None,
                interpret: bool = False,
                precision=jax.lax.Precision.HIGHEST,
                dof: float = 0.0, smm_iters: int = 2,
                smm_envelope_grads: bool = False,
                aug_noise: float = 0.0,
                aug_eps: jnp.ndarray | None = None):
    """Run T complete train steps in one kernel launch.

    Semantically equivalent to T iterations of
    ``svae_step.make_train_step(config, prior, optax.adam(lr), rho)`` on
    the full batch (oracle-tested at matched eps); returns the updated
    state and per-step {recon, local_kl, neg_loss} arrays. ``elbo`` needs
    the global KL — add ``-gmm.kl_global(state.pgm_nat, prior)`` outside
    (it changes nothing inside the step: no NN grad, CVI is stat-driven).
    The whole call — packing, kernel, unpacking — is ONE jitted program,
    so a training loop over chunks costs one dispatch per chunk.

    ``dof > 0`` runs the Student-t-prior (SMM) step instead — oracle
    ``make_train_step(..., model=svax.models.svae_smm)`` with
    ``config.dof/smm_iters/smm_envelope_grads`` matching these arguments
    (tests/test_tinystep_kernel.py SMM cases).

    ``aug_noise > 0`` trains on x + σ·ξ per step (the seed-robustness
    recipe, ``svax.train.loop.augment_step`` semantics) with ξ drawn
    in-kernel from the hardware PRNG, or injected via ``aug_eps``
    (T, N, d_in) in interpret/test mode.
    """
    if aug_noise > 0.0 and (eps is None) != (aug_eps is None):
        raise ValueError(
            "aug_noise > 0 with injected noise needs BOTH eps and aug_eps "
            "(or neither, for the in-kernel hardware PRNG)"
        )
    enc_w = state.nn_params["encoder"]
    dec_w = state.nn_params["decoder"]
    h1, h2 = enc_w[0]["w"].shape[1], enc_w[1]["w"].shape[1]
    k = prior.dir_nat.shape[0]
    geom = make_geom(
        n=x.shape[0], d_in=x.shape[1], d_lat=dec_w[0]["w"].shape[0],
        k=k, s=eps.shape[1] if eps is not None else num_samples,
        num_total=x.shape[0], h1=h1, h2=h2, precision=precision,
        dof=dof, smm_iters=smm_iters, smm_env=smm_envelope_grads,
        aug=aug_noise,
    )
    # Fold the step counter into the seed so back-to-back chunks with the
    # same (default) seed draw DIFFERENT noise: the kernel seeds each
    # step (seed, grid t) and t restarts at 0 every launch, which would
    # otherwise replay bit-identical eps streams chunk after chunk.
    seed = jnp.asarray(seed, jnp.int32) + state.step.astype(jnp.int32)
    return _train_chunk_jit(
        state, prior, x, seed, eps, aug_eps, _geom_key(geom), float(lr),
        float(rho), int(t_steps), interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("geom_key", "lr", "rho", "t_steps", "interpret"),
)
def _train_chunk_jit(state, prior, x, seed, eps, aug_eps, geom_key, lr, rho,
                     t_steps, interpret):
    geom = dict(geom_key)
    packed = pack_state(state, prior, x, geom, eps=eps, seed=seed,
                        aug_eps=aug_eps)
    new_packed, metrics = _chunk_call(
        packed, t_steps, lr, rho, geom_key, interpret
    )
    return unpack_state(new_packed, metrics, state, geom, t_steps)
