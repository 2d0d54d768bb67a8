"""Whole-train-step Pallas megakernel for small-d minibatch SVAE configs.

Generalization of ``tinystep_pallas`` (the d=2 full-batch headline kernel)
to the auto-svae shape class (BASELINE config #3: d_in=8, latent d=4,
K=10, S=4, minibatch 64, MLPs 100-100): ONE Pallas program runs T
complete Adam+CVI training steps per launch with all state (NN params,
Adam moments, PGM naturals) VMEM-resident across a ``grid=(T,)``. The
XLA scan path at this shape is op-count bound exactly like the pinwheel
was (~100 µs/step of launch gaps around microseconds of math); this
kernel removes the op count.

What generalizes beyond tinystep:

* **latent d > 2** — the SIN combine / sampling / local-KL / statistics
  run through ``combine_pallas``'s slot-form tile functions
  (``_tile_core``/``_tile_sampling``/``_tile_localstats``): unrolled
  general-d Cholesky/solve recurrences on (K_pad, M) planes, pure jnp,
  differentiable under the in-kernel ``jax.vjp``;
* **general-d expected parameters** — the NIW mean map (§9.2: Φ from
  naturals → Cholesky → Φ⁻¹, log|Φ|, digamma sums) computed in-kernel on
  (K_pad, 1) columns with the same unrolled recurrences;
* **minibatching** — the caller streams a pre-gathered (and optionally
  pre-augmented) batch stack; each grid step reads its (8, M_pad) block,
  so minibatch sampling/augmentation keep EXACT oracle semantics while
  per-step HBM traffic stays a few KB;
* **ρ schedules** — constant or the Trainer's inverse decay
  ρ_t = ρ₀/(1 + decay·t), computed in-kernel from the step counter.

Scope gate: Gaussian likelihood, weighted recon, 2-hidden-layer tanh
MLPs, d_in ≤ 8, latent d ≤ 6, single device, plain Adam. The headline
pinwheel class stays on ``tinystep_pallas`` (its closed-form 2×2 combine
and resident full batch are faster there).

Oracle: tests/test_flexstep_kernel.py runs this kernel in interpret mode
with injected ε + a fixed batch stack against explicit XLA steps
(``svae.forward`` + optax Adam + CVI), matching state and metrics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from svax.expfam.niw import NiwNat
from svax.pgm.gmm import GmmNat
from svax.ops.tinystep_pallas import (
    _ADAM_EPS,
    _B1,
    _B2,
    _NEG,
    _VAR_FLOOR,
    _digamma,
    _mlp3,
    _pack_b,
    _pack_wt,
    _round_up,
    _softplus,
)


# ----------------------------------------------------------- in-kernel math


def _expected_w_block(nat, k_maskc, num_k: int, d: int):
    """Packed naturals block (K_pad, 128) → combine's w block (K_pad, 128).

    General-d mirror of gmm.expected_params + combine_pallas.pack_expected:
    slot layout [E[logπ], E[log|Λ|], E[μᵀΛμ], E[Λμ](d), E[Λ](d²), 0-pad],
    computed with unrolled column recurrences (one Cholesky of Φ per
    component, §9.2). Padded component rows carry logπ = −1e30 so the
    in-tile softmax zeroes them (combine_pallas convention).
    """
    col = lambda i: nat[:, i : i + 1]  # (K_pad, 1)  # noqa: E731
    alpha = col(0) + 1.0
    sum_alpha = jnp.sum(alpha * k_maskc)
    log_pi = _digamma(alpha) - _digamma(jnp.full_like(alpha, 1.0) * sum_alpha)
    kappa = col(1 + d)
    m = [col(1 + i) / kappa for i in range(d)]
    phi = [[col(2 + d + i * d + j) - kappa * m[i] * m[j] for j in range(d)]
           for i in range(d)]
    nu = col(2 + d + d * d) - (d + 2.0)

    # Cholesky of Φ on columns (same recurrence as combine's _tile_core).
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        acc = phi[i][i]
        for t in range(i):
            acc = acc - L[i][t] * L[i][t]
        L[i][i] = jnp.sqrt(acc)
        inv_lii = 1.0 / L[i][i]
        for r in range(i + 1, d):
            acc = phi[r][i]
            for t in range(i):
                acc = acc - L[r][t] * L[i][t]
            L[r][i] = acc * inv_lii
    logdet_phi = 0.0
    for i in range(d):
        logdet_phi = logdet_phi + 2.0 * jnp.log(L[i][i])
    invL = [[None] * d for _ in range(d)]
    for i in range(d):
        invL[i][i] = 1.0 / L[i][i]
        for j in range(i - 1, -1, -1):
            acc = 0.0
            for t in range(j, i):
                acc = acc + L[i][t] * invL[t][j]
            invL[i][j] = -acc * invL[i][i]
    inv_phi = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            acc = 0.0
            for t in range(max(i, j), d):
                acc = acc + invL[t][i] * invL[t][j]
            inv_phi[i][j] = acc
            inv_phi[j][i] = acc

    pim = [sum(inv_phi[i][j] * m[j] for j in range(d)) for i in range(d)]
    quad = d / kappa + nu * sum(m[i] * pim[i] for i in range(d))
    logdet = (
        sum(_digamma((nu + 1.0 - (i + 1.0)) / 2.0) for i in range(d))
        + d * 0.6931471805599453
        - logdet_phi
    )
    cols = [
        jnp.where(k_maskc > 0.0, log_pi, _NEG),
        logdet,
        quad,
    ]
    cols += [nu * pim[i] for i in range(d)]
    for i in range(d):
        for j in range(d):
            cols.append(nu * inv_phi[i][j])
    pad = 128 - len(cols)
    return jnp.concatenate(
        cols + [jnp.zeros_like(alpha)] * pad, axis=1
    )  # (K_pad, 128)


def _take_row(plane, ki):
    """Row ki of a (K_pad, T) plane → (1, T) at canonical offset.

    Masked sublane reduction (Mosaic rejects lane-concat of slices at
    mismatched sublane offsets — tinystep lesson)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 0)
    return jnp.sum(jnp.where(idx == ki, plane, 0.0), axis=0, keepdims=True)


def _step_math(nn, w, xb, eps, n_mask, *, geom):
    """One full forward on the step's minibatch: (neg_loss, aux) — the
    vjp target. nn: dict of 12 padded plane tensors; w: expected-param
    block (non-diff closure); xb (8, M_pad); eps (S·d·K_pad, M_pad)."""
    from svax.ops.combine_pallas import (
        _tile_core,
        _tile_localstats,
        _tile_sampling,
    )

    d, d_in = geom["d_lat"], geom["d_in"]
    num_k, k_pad, s, m_pad = geom["k"], geom["k_pad"], geom["s"], geom["m_pad"]
    scale = geom["num_total"] / geom["m"]
    precision = geom["precision"]
    enc = {k[4:]: v for k, v in nn.items() if k.startswith("enc_")}
    dec = {k[4:]: v for k, v in nn.items() if k.startswith("dec_")}

    # Encoder → diagonal Gaussian potential rows (nets.encoder_apply).
    out = _mlp3(enc, xb, precision)  # (enc_out_pad, M_pad)
    pp = 1.0 / (_softplus(out[d : 2 * d, :]) + _VAR_FLOOR)  # (d, M_pad)
    ph = out[0:d, :] * pp

    core = _tile_core(ph, pp, w, d=d)
    z_rows = _tile_sampling(core, eps, d=d, s=s, k_pad=k_pad)
    local_row, stats_block = _tile_localstats(core, n_mask, d=d, k_pad=k_pad)

    # Decoder over ONE (d_lat_pad, K·S·M_pad) block (k-major, then s —
    # the tinystep layout); rows gathered by masked sublane reductions.
    dim_rows = []
    for i in range(d):
        dim_rows.append(jnp.concatenate(
            [_take_row(z_rows[(si * d + i) * k_pad : (si * d + i + 1) * k_pad,
                              :], ki)
             for ki in range(num_k) for si in range(s)],
            axis=1,
        ))  # (1, K·S·M_pad)
    zero_row = jnp.zeros_like(dim_rows[0])
    z_all = jnp.concatenate(
        dim_rows + [zero_row] * (geom["d_lat_pad"] - d), axis=0
    )
    ok = _mlp3(dec, z_all, precision)  # (dec_out_pad, K·S·M_pad)
    xs = jnp.concatenate([xb] * (num_k * s), axis=1)
    var = _softplus(ok[d_in : 2 * d_in, :]) + _VAR_FLOOR
    ll = -0.5 * (
        jnp.sum(jnp.log(var) + (xs[0:d_in, :] - ok[0:d_in, :]) ** 2 / var,
                axis=0, keepdims=True)
        + d_in * 1.8378770664093453
    )  # (1, K·S·M_pad)
    r_all = jnp.concatenate(
        [_take_row(core["resp"], ki) for ki in range(num_k) for _ in range(s)],
        axis=1,
    )
    nks_mask = jnp.concatenate([n_mask] * (num_k * s), axis=1)
    recon = scale * jnp.sum(r_all * ll * nks_mask) / float(s)
    local = scale * jnp.sum(local_row)  # _tile_localstats already masked

    neg_loss = -(recon - local) / float(geom["num_total"])
    return neg_loss, (stats_block, recon, local)


# -------------------------------------------------------------- the kernel


def _make_kernel(*, geom, lr, rho0, rho_decay, use_rng):
    from jax.experimental import pallas as pl

    d = geom["d_lat"]
    k_pad, m_pad, s = geom["k_pad"], geom["m_pad"], geom["s"]
    m_real, num_k = geom["m"], geom["k"]
    names = geom["tensor_names"]
    rows = geom["tensor_rows"]
    scale = geom["num_total"] / geom["m"]

    def kernel(*refs):
        # inputs: scalars(SMEM), xb stream, prior, [eps stream], init×12,
        # nat0; outputs: state×12, nat, metrics.
        idx = 0
        scal_ref = refs[idx]; idx += 1
        xb_ref = refs[idx]; idx += 1
        prior_ref = refs[idx]; idx += 1
        eps_ref = None
        if not use_rng:
            eps_ref = refs[idx]; idx += 1
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
            jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1) < m_real
        ).astype(jnp.float32)
        k_maskc = (
            jax.lax.broadcasted_iota(jnp.int32, (k_pad, 1), 0) < num_k
        ).astype(jnp.float32)

        if use_rng:
            from svax.ops.combine_pallas import _tile_prng_normals

            eps = _tile_prng_normals(
                scal_ref[0, 1], t, 1, s * d * k_pad, m_pad
            )
        else:
            eps = eps_ref[:]

        nn = {nm: state_refs[i][: rows[i], :] for i, nm in enumerate(names)}
        nat = nat_ref[:]
        w = _expected_w_block(nat, k_maskc, num_k, d)

        fn = functools.partial(
            _step_math, w=w, xb=xb_ref[:], eps=eps, n_mask=n_mask, geom=geom
        )
        (neg_loss, vjp, aux) = jax.vjp(fn, nn, has_aux=True)
        (grads,) = vjp(jnp.ones((), jnp.float32))
        stats_block, recon, local = aux

        # Adam (optax defaults); m/v stacked under each param.
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

        # CVI update with the Trainer's ρ schedule (ρ_t at the PRE-update
        # step counter, matching rho(state.step) in svae_step).
        cvi_t = (scal_ref[0, 0] + t).astype(jnp.float32)
        rho_t = rho0 / (1.0 + rho_decay * cvi_t)
        bcol = lambda j: stats_block[:, j : j + 1]  # noqa: E731
        counts = bcol(0)
        delta_cols = [counts]                                  # Dirichlet
        delta_cols += [bcol(1 + i) for i in range(d)]          # η₁
        delta_cols.append(counts)                              # η₂
        delta_cols += [bcol(1 + d + i) for i in range(d * d)]  # η₃
        delta_cols.append(counts)                              # η₄
        zcol = jnp.zeros_like(counts)
        delta = jnp.concatenate(
            delta_cols + [zcol] * (128 - len(delta_cols)), axis=1
        )
        nat_ref[:] = (1.0 - rho_t) * nat + rho_t * (
            prior_ref[:] + scale * delta
        )

        r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slot = lambda j: ((r_i == 0) & (c_i == j)).astype(jnp.float32)  # noqa: E731
        met_ref[0] = (
            slot(0) * recon + slot(1) * local + slot(2) * neg_loss
            + slot(3) * rho_t
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("t_steps", "lr", "rho0", "rho_decay", "geom_key",
                     "interpret"),
)
def _chunk_call(packed, t_steps, lr, rho0, rho_decay, geom_key, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    geom = dict(geom_key)
    geom["tensor_names"] = tuple(n for n, _ in geom_key_tensors(geom))
    geom["tensor_rows"] = tuple(r for _, (r, _) in geom_key_tensors(geom))
    d, k_pad, m_pad, s = (geom["d_lat"], geom["k_pad"], geom["m_pad"],
                          geom["s"])
    use_rng = "eps" not in packed

    kernel = _make_kernel(geom=geom, lr=lr, rho0=rho0, rho_decay=rho_decay,
                          use_rng=use_rng)
    fixed2 = lambda t: (0, 0)  # noqa: E731

    tensors = geom_key_tensors(geom)
    state_specs = [
        pl.BlockSpec((3 * r, c), fixed2, memory_space=pltpu.VMEM)
        for _, (r, c) in tensors
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars (1, 2) int32
        pl.BlockSpec((8, m_pad), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),  # per-step batch block
        pl.BlockSpec((k_pad, 128), fixed2, memory_space=pltpu.VMEM),
    ]
    inputs = [packed["scalars"], packed["xb"], packed["prior"]]
    if not use_rng:
        in_specs.append(
            pl.BlockSpec((s * d * k_pad, m_pad), lambda t: (t, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(packed["eps"])
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
    return [
        ("enc_w1t", (geom["h1e"], geom["d_in_pad"])),
        ("enc_b1", (geom["h1e"], 1)),
        ("enc_w2t", (geom["h2e"], geom["h1e"])),
        ("enc_b2", (geom["h2e"], 1)),
        ("enc_w3t", (geom["enc_out"], geom["h2e"])),
        ("enc_b3", (geom["enc_out"], 1)),
        ("dec_w1t", (geom["h1d"], geom["d_lat_pad"])),
        ("dec_b1", (geom["h1d"], 1)),
        ("dec_w2t", (geom["h2d"], geom["h1d"])),
        ("dec_b2", (geom["h2d"], 1)),
        ("dec_w3t", (geom["dec_out"], geom["h2d"])),
        ("dec_b3", (geom["dec_out"], 1)),
    ]


def make_geom(*, m, d_in, d_lat, k, s, enc_hidden, dec_hidden, num_total,
              precision=jax.lax.Precision.HIGHEST):
    assert d_in <= 8 and 2 <= d_lat <= 6, "flexstep supports d_in<=8, d<=6"
    return dict(
        m=m, m_pad=_round_up(m, 128), d_in=d_in, d_in_pad=8,
        d_lat=d_lat, d_lat_pad=8, k=k, k_pad=_round_up(k, 8), s=s,
        h1e=_round_up(enc_hidden[0], 8), h2e=_round_up(enc_hidden[1], 8),
        h1d=_round_up(dec_hidden[0], 8), h2d=_round_up(dec_hidden[1], 8),
        enc_out=_round_up(2 * d_lat, 8), dec_out=_round_up(2 * d_in, 8),
        num_total=num_total, precision=precision,
    )


def _geom_key(geom):
    return tuple(sorted((k, v) for k, v in geom.items()))


def _pack_nat_block(nat: GmmNat, geom) -> jnp.ndarray:
    """GmmNat → (K_pad, 128) slot block, general d (layout as tinystep:
    [dir, η₁(d), η₂, η₃(d²), η₄]); padded rows carry SAFE naturals
    (α=1, κ=1, m=0, Φ=I, ν=d+1 → η=(0, 0·d, 1, I, 2d+3))."""
    k, k_pad, d = geom["k"], geom["k_pad"], geom["d_lat"]
    f32 = jnp.float32
    cols = [
        jnp.asarray(nat.dir_nat, f32)[:, None],
        jnp.asarray(nat.niw_nat.eta1, f32),
        jnp.asarray(nat.niw_nat.eta2, f32)[:, None],
        jnp.asarray(nat.niw_nat.eta3, f32).reshape(k, d * d),
        jnp.asarray(nat.niw_nat.eta4, f32)[:, None],
    ]
    block = jnp.concatenate(cols, axis=1)  # (k, 3 + d + d²)
    safe = jnp.concatenate([
        jnp.zeros((1, 1 + d), f32),
        jnp.ones((1, 1), f32),
        jnp.eye(d, dtype=f32).reshape(1, d * d),
        jnp.full((1, 1), 2.0 * d + 3.0, f32),
    ], axis=1)
    block = jnp.concatenate(
        [block, jnp.broadcast_to(safe, (k_pad - k, block.shape[1]))], axis=0
    )
    return jnp.pad(block, ((0, 0), (0, 128 - block.shape[1])))


def _unpack_nat_block(block: jnp.ndarray, geom) -> GmmNat:
    k, d = geom["k"], geom["d_lat"]
    return GmmNat(
        dir_nat=block[:k, 0],
        niw_nat=NiwNat(
            eta1=block[:k, 1 : 1 + d],
            eta2=block[:k, 1 + d],
            eta3=block[:k, 2 + d : 2 + d + d * d].reshape(k, d, d),
            eta4=block[:k, 2 + d + d * d],
        ),
    )


def pack_state(state, prior: GmmNat, batches: jnp.ndarray, geom,
               eps: jnp.ndarray | None = None, seed: int = 0) -> dict:
    """SvaeTrainState + (T, M, d_in) batch stack → the kernel's plane dict.

    ``eps`` (T, S, M, K, d) switches the kernel to injected noise (tests);
    None uses the in-kernel hardware PRNG seeded by (seed, grid step).
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
    t_steps, m, d_in = batches.shape
    m_pad = geom["m_pad"]
    xb = jnp.transpose(jnp.asarray(batches, jnp.float32), (0, 2, 1))
    xb = jnp.pad(xb, ((0, 0), (0, 8 - d_in), (0, m_pad - m)))
    packed["xb"] = xb.reshape(t_steps * 8, m_pad)
    packed["nat"] = _pack_nat_block(state.pgm_nat, geom)
    packed["prior"] = _pack_nat_block(prior, geom)
    packed["scalars"] = jnp.stack(
        [jnp.asarray(adam.count, jnp.int32), jnp.asarray(seed, jnp.int32)]
    )[None, :]
    if eps is not None:
        d, k, k_pad, s = (geom["d_lat"], geom["k"], geom["k_pad"],
                          geom["s"])
        # (T, S, M, K, d) → rows (s, dim, k) × lanes m (tile_sampling
        # layout: eps block row (si·d + i)·K_pad + k).
        e = jnp.transpose(jnp.asarray(eps, jnp.float32), (0, 1, 4, 3, 2))
        e = jnp.pad(e, ((0, 0), (0, 0), (0, 0), (0, k_pad - k),
                        (0, m_pad - m)))
        packed["eps"] = e.reshape(t_steps * s * d * k_pad, m_pad)
    return packed


def unpack_state(packed, metrics, state_template, geom, t_steps: int):
    """Kernel outputs → (SvaeTrainState, metrics dict of (T,) arrays)."""
    from svax.train.svae_step import SvaeTrainState

    tensors = dict(geom_key_tensors(geom))
    enc_t = state_template.nn_params["encoder"]
    dec_t = state_template.nn_params["decoder"]

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
                out.append({
                    "w": wt[: w_shape[1], : w_shape[0]].T,
                    "b": b[: template[li]["b"].shape[0], 0],
                })
            layers.append(out)
        return ([o[0] for o in layers], [o[1] for o in layers],
                [o[2] for o in layers])

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
        "rho": metrics[:, 0, 3],
    }
    return state, mets


# --------------------------------------------------------------- public API


def supported(config, *, d_in: int, encoder_hidden, decoder_hidden) -> bool:
    """Gate: the shape class this kernel is built for (module docstring)."""
    return (
        2 <= config.latent_dim <= 6
        and d_in <= 8
        and config.likelihood == "gaussian"
        and config.recon_mode == "weighted"
        and getattr(config, "encoder_head", "diag") == "diag"
        and len(encoder_hidden) == 2
        and len(decoder_hidden) == 2
        and config.activation is jnp.tanh
        and config.jitter == 0.0
    )


def train_chunk(state, prior: GmmNat, batches: jnp.ndarray, *, lr: float,
                rho: float, rho_decay: float = 0.0, num_total: int,
                num_samples: int = 4, seed=0,
                eps: jnp.ndarray | None = None, interpret: bool = False,
                precision=jax.lax.Precision.HIGHEST):
    """Run T complete train steps (one per batch row) in one kernel launch.

    ``batches`` is the pre-gathered (T, M, d_in) minibatch stack (full
    batch = every row the same). Semantically equivalent to T iterations
    of ``svae_step.make_train_step(config, prior, optax.adam(lr), rho_t)``
    on those batches (oracle-tested at matched eps), with
    ρ_t = rho/(1 + rho_decay·t) — the Trainer's schedule family. Returns
    the updated state and per-step {recon, local_kl, neg_loss, rho}.
    The ``elbo`` metric needs the global KL — add
    ``-gmm.kl_global(state.pgm_nat, prior)`` outside.
    """
    enc_w = state.nn_params["encoder"]
    dec_w = state.nn_params["decoder"]
    t_steps, m, d_in = batches.shape
    geom = make_geom(
        m=m, d_in=d_in, d_lat=dec_w[0]["w"].shape[0],
        k=prior.dir_nat.shape[0],
        s=eps.shape[1] if eps is not None else num_samples,
        enc_hidden=(enc_w[0]["w"].shape[1], enc_w[1]["w"].shape[1]),
        dec_hidden=(dec_w[0]["w"].shape[1], dec_w[1]["w"].shape[1]),
        num_total=num_total, precision=precision,
    )
    # Fold the step counter into the seed (tinystep convention) so
    # back-to-back chunks never replay the same hardware-PRNG stream.
    seed = jnp.asarray(seed, jnp.int32) + state.step.astype(jnp.int32)
    return _train_chunk_jit(
        state, prior, batches, seed, eps, _geom_key(geom), float(lr),
        float(rho), float(rho_decay), int(t_steps), interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("geom_key", "lr", "rho0", "rho_decay", "t_steps",
                     "interpret"),
)
def _train_chunk_jit(state, prior, batches, seed, eps, geom_key, lr, rho0,
                     rho_decay, t_steps, interpret):
    geom = dict(geom_key)
    packed = pack_state(state, prior, batches, geom, eps=eps, seed=seed)
    new_packed, metrics = _chunk_call(
        packed, t_steps, lr, rho0, rho_decay, geom_key, interpret
    )
    return unpack_state(new_packed, metrics, state, geom, t_steps)
