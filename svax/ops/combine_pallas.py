"""Fused SIN-combine Pallas kernel (forward + recompute backward).

After the bf16 decoder win, the big-K SVAE step is bound by the combine
chain (measured: 5.7 of 7.9 ms, BASELINE.md): XLA materializes ~a dozen
(N, K, d, d) tensors (J̃, chol, inverse, ezz, plus backward residuals)
between fusion groups. This kernel runs the WHOLE per-(n, k) pipeline —

    J̃ = diag(Pₙ) + E[Λ_k] → chol → μ̃ → log|J̃| → r̃ (softmax over K)
    → Σ̃ = J̃⁻¹ → closed-form local KL → z = μ̃ + L̃⁻ᵀε (S samples)
    → weighted sufficient statistics (Σr, Σr·μ̃, Σr·ezz)

— in ONE pass over N-tiles with every intermediate in VMEM. Only what
downstream actually consumes leaves the kernel: z samples, log r̃, the
per-point local-KL row, and the (K, F) statistics block (accumulated
across the grid, estep_pallas-style). The N·K·d·d Cholesky/inverse never
touch HBM in either direction: the backward pass is a PAIR of recompute
kernels (split by cotangent linearity — see ``_bwd_call``) that re-run
the tile forward and apply ``jax.vjp`` of the tile function in VMEM
(flash-attention-style rematerialization).

Layouts (all 2-D, Mosaic-native):
  * per-(n,k) scalar slots are (K_pad, T) blocks — K on sublanes
    (8-padded), the N-tile on lanes (128-multiple);
  * potentials arrive transposed (d, N): one (1, T) row per latent dim;
  * expected params are packed into one (K_pad, W_LANES) block, one lane
    column per slot (log π, E[log|Λ|], E[μᵀΛμ], E[Λμ]_i, E[Λ]_ij —
    d²+d+3 lanes rounded up to a 128 multiple: one lane register for
    d ≤ 10, two for 11 ≤ d ≤ 15, etc. The wider blocks are tested past
    the 128-lane boundary (d=11, 12; values+grads in interpret mode) and
    measured a WIN on v5e at d=12/K=100/N=1024: fused fwd 2.37 ms vs
    XLA 3.81 ms);
  * ε and z use (S·d, K_pad·tiles…) row-slot layouts, transposed at the
    jitted boundary.

The pure-jnp oracle is the existing ``svae.sin_combine`` path; tests
compare values AND gradients in interpret mode (SURVEY.md §5).

Component parallelism (K-sharding) composes via a flash-softmax
decomposition: ``log_rho_fused`` (a light ρ-only kernel) emits each
shard's pre-softmax logits, the global normalizer is one
pmax + psum logsumexp over the mesh axis (``gmm.lse_over_components``),
and ``combine_fused(log_norm=...)`` consumes it so responsibilities,
local-KL rows, and statistics are weighted by the GLOBAL softmax.
Autodiff composes exactly (the lse path carries the cross-shard
cotangents through the ρ-kernel's recompute VJP); verified against the
single-device XLA forward on a 4-way K-shard mesh — values, statistics,
and NN gradients (tests/test_combine_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from svax.pgm.gmm import GmmExpected, GmmSuffStats

_LOG_2PI = 1.8378770664093453
_NEG = -1e30


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# --------------------------------------------------------------- tile math


def _tile_core(ph, pp, w, *, d: int, norm=None):
    """Shared slot-form core: J̃ → chol → μ̃ → log|J̃| → softmax over K.

    ph, pp: (d, T) potential rows; w: (K_pad, W_LANES) packed expecteds.
    Returns a dict of slot values, every per-(n,k) quantity a (K_pad, T)
    block. Pure jnp: runs inside Pallas kernels and under jax.vjp.

    ``norm``: optional (1, T) externally-supplied log-normalizer row.
    When given, responsibilities use log r̃ − norm instead of the local
    softmax — the component-parallel mode, where the true normalizer is a
    logsumexp ACROSS K-shards (flash-softmax decomposition: a light
    ρ-kernel emits log ρ, the cross-shard lse rides the mesh axis in XLA,
    and this kernel consumes the result).
    """
    col = lambda j: w[:, j : j + 1]  # (K_pad, 1)  # noqa: E731
    logpi = col(0)
    logdet_k = col(1)
    quad_k = col(2)
    pm = [col(3 + i) for i in range(d)]
    pr = [[col(3 + d + i * d + j) for j in range(d)] for i in range(d)]

    row = lambda a, i: a[i : i + 1, :]  # (1, T)  # noqa: E731

    J = [[pr[i][j] + (row(pp, i) if i == j else 0.0) for j in range(d)]
         for i in range(d)]
    h = [pm[i] + row(ph, i) for i in range(d)]

    # Cholesky (unrolled slot recurrence).
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        acc = J[i][i]
        for m in range(i):
            acc = acc - L[i][m] * L[i][m]
        L[i][i] = jnp.sqrt(acc)
        inv_lii = 1.0 / L[i][i]
        for r in range(i + 1, d):
            acc = J[r][i]
            for m in range(i):
                acc = acc - L[r][m] * L[i][m]
            L[r][i] = acc * inv_lii

    # μ̃ via two triangular solves.
    y = [None] * d
    for i in range(d):
        acc = h[i]
        for j in range(i):
            acc = acc - L[i][j] * y[j]
        y[i] = acc / L[i][i]
    mu = [None] * d
    for i in reversed(range(d)):
        acc = y[i]
        for j in range(i + 1, d):
            acc = acc - L[j][i] * mu[j]
        mu[i] = acc / L[i][i]

    logdet_J = 0.0
    for i in range(d):
        logdet_J = logdet_J + 2.0 * jnp.log(L[i][i])

    # Responsibilities: softmax over the K sublanes (padded K rows carry
    # logpi = −1e30 → weight 0).
    dot_mu_h = 0.0
    for i in range(d):
        dot_mu_h = dot_mu_h + mu[i] * h[i]
    log_rho = logpi + 0.5 * logdet_k - 0.5 * quad_k + 0.5 * dot_mu_h \
        - 0.5 * logdet_J
    if norm is None:
        mx = jnp.max(log_rho, axis=0, keepdims=True)
        ex = jnp.exp(log_rho - mx)
        denom = jnp.sum(ex, axis=0, keepdims=True)
        log_resp = log_rho - (mx + jnp.log(denom))
        resp = ex / denom
    else:
        log_resp = log_rho - norm
        resp = jnp.exp(log_resp)

    return dict(logpi=logpi, logdet_k=logdet_k, quad_k=quad_k, pm=pm, pr=pr,
                L=L, mu=mu, logdet_J=logdet_J, log_rho=log_rho,
                log_resp=log_resp, resp=resp)


def _tile_sampling(core, eps, *, d: int, s: int, k_pad: int):
    """z = μ̃ + L̃⁻ᵀε in slot form → (S·d·K_pad, T) row blocks."""
    L, mu = core["L"], core["mu"]
    z_rows = []
    for si in range(s):
        e = [eps[(si * d + i) * k_pad : (si * d + i) * k_pad + k_pad, :]
             for i in range(d)]
        zs = [None] * d
        for i in reversed(range(d)):  # back substitution for L̃ᵀ v = ε
            acc = e[i]
            for j in range(i + 1, d):
                acc = acc - L[j][i] * zs[j]
            zs[i] = acc / L[i][i]
        for i in range(d):
            z_rows.append(mu[i] + zs[i])
    return jnp.concatenate(z_rows, axis=0)


def _tile_localstats(core, mask, *, d: int, k_pad: int):
    """Σ̃ = J̃⁻¹ → closed-form local KL + weighted statistics columns."""
    L, mu, resp = core["L"], core["mu"], core["resp"]
    invL = [[None] * d for _ in range(d)]
    for i in range(d):
        invL[i][i] = 1.0 / L[i][i]
        for j in range(i - 1, -1, -1):
            acc = 0.0
            for m in range(j, i):
                acc = acc + L[i][m] * invL[m][j]
            invL[i][j] = -acc * invL[i][i]
    cov = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            acc = 0.0
            for m in range(i, d):
                acc = acc + invL[m][i] * invL[m][j]
            cov[i][j] = acc
            cov[j][i] = acc

    # Closed-form local KL (svae.local_kl_term in slot form).
    cross = 0.0
    for i in range(d):
        cross = cross + core["pm"][i] * mu[i]
    trq = 0.0
    for i in range(d):
        for j in range(d):
            trq = trq + core["pr"][i][j] * (cov[i][j] + mu[i] * mu[j])
    g_k = 0.5 * core["logdet_k"] - 0.5 * d * _LOG_2PI - 0.5 * core["quad_k"]
    e_log_pbar = core["logpi"] + g_k + cross - 0.5 * trq
    e_log_q = core["log_resp"] - 0.5 * d * (1.0 + _LOG_2PI) \
        + 0.5 * core["logdet_J"]
    local = -jnp.sum(resp * (e_log_pbar - e_log_q), axis=0, keepdims=True)
    local = local * mask  # (1, T)

    # Weighted statistics contribution (lane reductions → block columns).
    rm = resp * mask
    f_pad = stats_lanes(d)
    cols = [jnp.sum(rm, axis=1, keepdims=True)]  # counts at slot 0
    for i in range(d):
        cols.append(jnp.sum(rm * mu[i], axis=1, keepdims=True))
    for i in range(d):
        for j in range(d):
            cols.append(jnp.sum(rm * (cov[i][j] + mu[i] * mu[j]),
                                axis=1, keepdims=True))
    pad = f_pad - len(cols)
    block = jnp.concatenate(
        cols + [jnp.zeros((k_pad, pad), jnp.float32)], axis=1
    )  # (K_pad, F_pad)
    return local, block


def _tile_math(ph, pp, w, eps, mask, *, d: int, s: int, k: int, k_pad: int,
               norm=None):
    """The whole combine on one tile (forward kernel body)."""
    core = _tile_core(ph, pp, w, d=d, norm=norm)
    z_out = _tile_sampling(core, eps, d=d, s=s, k_pad=k_pad)
    local, block = _tile_localstats(core, mask, d=d, k_pad=k_pad)
    mu_out = jnp.concatenate(core["mu"], axis=0)  # (d·K_pad, T)
    return z_out, core["log_resp"], mu_out, local, block


def stats_lanes(d: int) -> int:
    return _round_up(1 + d + d * d, 128)


def w_lanes(d: int) -> int:
    return _round_up(3 + d + d * d, 128)


def _tile_prng_normals(seed, base, m: int, rows: int, chunk: int):
    """In-kernel ε ~ N(0,1): hardware PRNG + Box–Muller (24-bit mantissa).

    ``seed`` is an int32 scalar already read out of SMEM. Bits are
    generated in ``chunk``-lane sub-blocks, each seeded
    (seed, absolute-sub-block-index), so a backward kernel running at
    tile width == ``chunk`` regenerates EXACTLY the forward's bits for
    its columns regardless of the forward tile width (the fwd/bwd grids
    only agree on n_pad). The tinystep megakernel shares this helper
    (one sub-block per train step, seeded (seed, step)).
    """
    from jax.experimental.pallas import tpu as pltpu

    subs = []
    mask24 = jnp.int32(0x00FFFFFF)
    for j in range(m):
        pltpu.prng_seed(seed, base + j)
        b1 = pltpu.prng_random_bits((rows, chunk))
        b2 = pltpu.prng_random_bits((rows, chunk))
        # prng_random_bits returns SIGNED int32 — mask the low 24 bits
        # (an arithmetic >> would fold half the stream negative; measured
        # ε std 3.85 from the clamp spikes before this fix). +0.5 keeps
        # u1 strictly inside (0, 1): no log(0), no clamp.
        u1 = ((b1 & mask24).astype(jnp.float32) + 0.5) * (1.0 / 16777216.0)
        u2 = (b2 & mask24).astype(jnp.float32) * (1.0 / 16777216.0)
        subs.append(
            jnp.sqrt(-2.0 * jnp.log(u1))
            * jnp.cos(jnp.float32(6.283185307179586) * u2)
        )
    return jnp.concatenate(subs, axis=1) if m > 1 else subs[0]


# ------------------------------------------------------------ pallas calls


@functools.partial(
    jax.jit, static_argnames=("tile", "d", "k_pad", "interpret")
)
def _rho_fwd_call(ph_t, pp_t, w, *, tile, d, k_pad, interpret):
    """Light kernel: core through log ρ only → (K_pad, n_pad)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = ph_t.shape[-1]

    def kernel(ph_ref, pp_ref, w_ref, rho_ref):
        core = _tile_core(ph_ref[:], pp_ref[:], w_ref[:], d=d)
        rho_ref[:] = core["log_rho"]

    return pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, w.shape[-1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_pad, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(ph_t, pp_t, w)


@functools.partial(
    jax.jit, static_argnames=("tile", "d", "k_pad", "interpret")
)
def _rho_bwd_call(ph_t, pp_t, w, drho_t, *, tile, d, k_pad, interpret):
    """Recompute backward of the ρ-kernel (jax.vjp of the core in VMEM)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = ph_t.shape[-1]
    pot_spec = pl.BlockSpec((d, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k_pad, w.shape[-1]), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((k_pad, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)

    def kernel(ph_ref, pp_ref, w_ref, drho_ref, dph_ref, dpp_ref, dw_ref):
        i = pl.program_id(0)

        def f(ph, pp, wv):
            return _tile_core(ph, pp, wv, d=d)["log_rho"]

        _, vjp = jax.vjp(f, ph_ref[:], pp_ref[:], w_ref[:])
        dph, dpp, dw = vjp(drho_ref[:])
        dph_ref[:] = dph
        dpp_ref[:] = dpp

        @pl.when(i == 0)
        def _init():
            dw_ref[:] = dw

        @pl.when(i > 0)
        def _acc():
            dw_ref[:] = dw_ref[:] + dw

    return pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[pot_spec, pot_spec, w_spec, kt_spec],
        out_specs=(pot_spec, pot_spec, w_spec),
        out_shape=(
            jax.ShapeDtypeStruct((d, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((d, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, w.shape[-1]), jnp.float32),
        ),
        interpret=interpret,
    )(ph_t, pp_t, w, drho_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _rho_core(ph_t, pp_t, w, tile, d, k_pad, interpret):
    return _rho_fwd_call(ph_t, pp_t, w, tile=tile, d=d, k_pad=k_pad,
                         interpret=interpret)


def _rho_core_fwd(ph_t, pp_t, w, tile, d, k_pad, interpret):
    out = _rho_fwd_call(ph_t, pp_t, w, tile=tile, d=d, k_pad=k_pad,
                        interpret=interpret)
    return out, (ph_t, pp_t, w)


def _rho_core_bwd(tile, d, k_pad, interpret, res, drho):
    ph_t, pp_t, w = res
    return _rho_bwd_call(ph_t, pp_t, w, drho, tile=tile, d=d, k_pad=k_pad,
                         interpret=interpret)


_rho_core.defvjp(_rho_core_fwd, _rho_core_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "d", "s", "k", "k_pad", "interpret", "use_norm",
                     "gen_eps", "gen_chunk"),
)
def _fwd_call(ph_t, pp_t, w, eps_t, mask, norm_t, *, tile, d, s, k, k_pad,
              interpret, use_norm=False, gen_eps=False, gen_chunk=128):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = ph_t.shape[-1]
    grid = (n_pad // tile,)
    f_pad = stats_lanes(d)

    def kernel(ph_ref, pp_ref, w_ref, eps_ref, mask_ref, norm_ref,
               z_ref, lr_ref, mu_ref, local_ref, stats_ref):
        i = pl.program_id(0)
        if gen_eps:
            # eps_ref is the SMEM seed; bits regenerate per gen_chunk
            # columns (see _tile_prng_normals).
            m = tile // gen_chunk
            eps_v = _tile_prng_normals(
                eps_ref[0], i * m, m, s * d * k_pad, gen_chunk
            )
        else:
            eps_v = eps_ref[:]
        z, log_resp, mu, local, block = _tile_math(
            ph_ref[:], pp_ref[:], w_ref[:], eps_v, mask_ref[0:1, :],
            d=d, s=s, k=k, k_pad=k_pad,
            norm=norm_ref[0:1, :] if use_norm else None,
        )
        z_ref[:] = z
        lr_ref[:] = log_resp
        mu_ref[:] = mu
        local_ref[0:1, :] = local
        local_ref[1:, :] = jnp.zeros((7, local.shape[-1]), jnp.float32)

        @pl.when(i == 0)
        def _init():
            stats_ref[:] = block

        @pl.when(i > 0)
        def _acc():
            stats_ref[:] = stats_ref[:] + block

    sd = s * d
    eps_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM) if gen_eps
        else pl.BlockSpec((sd * k_pad, tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    )
    z_t, lr_t, mu_t, local_t, stats = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, w.shape[-1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            eps_spec,
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((sd * k_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d * k_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((sd * k_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((d * k_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, f_pad), jnp.float32),
        ),
        interpret=interpret,
    )(ph_t, pp_t, w, eps_t, mask, norm_t)
    return z_t, lr_t, mu_t, local_t, stats


@functools.partial(
    jax.jit,
    static_argnames=("tile", "d", "s", "k", "k_pad", "interpret", "use_norm",
                     "gen_eps"),
)
def _bwd_call(ph_t, pp_t, w, eps_t, mask, norm_t, dz_t, dlr_t, dmu_t,
              dlocal_t, dstats, *, tile, d, s, k, k_pad, interpret,
              use_norm=False, gen_eps=False):
    """Recompute-backward via TWO Pallas kernels (cotangent linearity).

    jax.vjp of the whole tile in one kernel holds every forward slot AND
    its cotangent live — measured 17.4 MB scoped VMEM at d=10, K=100,
    tile=128 (over the 16 MB limit), and lane tiles cannot shrink below
    128. Splitting the output cotangents gives two structurally smaller
    programs: (a) the sampling path (z, log r̃) never traces the inverse /
    statistics, (b) the local-KL/statistics path never traces the solves
    against ε. Each recomputes the shared core (cheap VPU work, VMEM-
    resident) and the input cotangents add.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = ph_t.shape[-1]
    grid = (n_pad // tile,)
    f_pad = stats_lanes(d)
    sd = s * d

    pot_spec = pl.BlockSpec((d, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k_pad, w.shape[-1]), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    eps_spec = pl.BlockSpec((sd * k_pad, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row8_spec = pl.BlockSpec((8, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((k_pad, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((k_pad, f_pad), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_specs = (pot_spec, pot_spec, w_spec)
    out_shape = (
        jax.ShapeDtypeStruct((d, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((d, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((k_pad, w.shape[-1]), jnp.float32),
    )
    if use_norm:
        # Each backward kernel also emits the (per-tile) normalizer
        # cotangent; rows 1..7 are zero padding.
        out_specs = out_specs + (row8_spec,)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        )

    def accumulate(i, dw_ref, dw):
        @pl.when(i == 0)
        def _init():
            dw_ref[:] = dw

        @pl.when(i > 0)
        def _acc():
            dw_ref[:] = dw_ref[:] + dw

    # (a) sampling-path vjp: outputs (z, log_resp, μ̃); ε is a closed-over
    # constant (its cotangent is never needed — ε is exogenous noise).
    mu_spec = pl.BlockSpec((d * k_pad, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)

    def kernel_zlr(*refs):
        if use_norm:
            (ph_ref, pp_ref, w_ref, eps_ref, norm_ref, dz_ref, dlr_ref,
             dmu_ref, dph_ref, dpp_ref, dw_ref, dn_ref) = refs
        else:
            (ph_ref, pp_ref, w_ref, eps_ref, dz_ref, dlr_ref, dmu_ref,
             dph_ref, dpp_ref, dw_ref) = refs
        i = pl.program_id(0)
        if gen_eps:
            # Regenerate the forward's exact bits: this kernel runs at
            # tile == gen_chunk granularity, so the absolute sub-block
            # index is just the program id.
            eps_v = _tile_prng_normals(eps_ref[0], i, 1, s * d * k_pad, tile)
        else:
            eps_v = eps_ref[:]

        if use_norm:
            def f(ph, pp, wv, nrm):
                core = _tile_core(ph, pp, wv, d=d, norm=nrm)
                z = _tile_sampling(core, eps_v, d=d, s=s, k_pad=k_pad)
                return (z, core["log_resp"],
                        jnp.concatenate(core["mu"], axis=0))

            _, vjp = jax.vjp(f, ph_ref[:], pp_ref[:], w_ref[:],
                             norm_ref[0:1, :])
            dph, dpp, dw, dn = vjp((dz_ref[:], dlr_ref[:], dmu_ref[:]))
            dn_ref[0:1, :] = dn
            dn_ref[1:, :] = jnp.zeros((7, dn.shape[-1]), jnp.float32)
        else:
            def f(ph, pp, wv):
                core = _tile_core(ph, pp, wv, d=d)
                z = _tile_sampling(core, eps_v, d=d, s=s, k_pad=k_pad)
                return (z, core["log_resp"],
                        jnp.concatenate(core["mu"], axis=0))

            _, vjp = jax.vjp(f, ph_ref[:], pp_ref[:], w_ref[:])
            dph, dpp, dw = vjp((dz_ref[:], dlr_ref[:], dmu_ref[:]))
        dph_ref[:] = dph
        dpp_ref[:] = dpp
        accumulate(i, dw_ref, dw)

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    dz_spec = eps_spec  # (S·d·K_pad, tile) — the z-cotangent block
    if gen_eps:
        eps_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs_zlr = [pot_spec, pot_spec, w_spec, eps_spec]
    ins_zlr = [ph_t, pp_t, w, eps_t]
    if use_norm:
        in_specs_zlr += [row8_spec]
        ins_zlr += [norm_t]
    in_specs_zlr += [dz_spec, kt_spec, mu_spec]
    ins_zlr += [dz_t, dlr_t, dmu_t]
    out1 = pl.pallas_call(
        kernel_zlr,
        grid=grid,
        compiler_params=params,
        in_specs=in_specs_zlr,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins_zlr)

    # (b) local-KL + statistics vjp: never touches ε or the solves.
    def kernel_ls(*refs):
        if use_norm:
            (ph_ref, pp_ref, w_ref, mask_ref, norm_ref, dlocal_ref,
             dstats_ref, dph_ref, dpp_ref, dw_ref, dn_ref) = refs
        else:
            (ph_ref, pp_ref, w_ref, mask_ref, dlocal_ref, dstats_ref,
             dph_ref, dpp_ref, dw_ref) = refs
        i = pl.program_id(0)
        mask_v = mask_ref[0:1, :]

        if use_norm:
            def f(ph, pp, wv, nrm):
                core = _tile_core(ph, pp, wv, d=d, norm=nrm)
                return _tile_localstats(core, mask_v, d=d, k_pad=k_pad)

            _, vjp = jax.vjp(f, ph_ref[:], pp_ref[:], w_ref[:],
                             norm_ref[0:1, :])
            dph, dpp, dw, dn = vjp((dlocal_ref[0:1, :], dstats_ref[:]))
            dn_ref[0:1, :] = dn
            dn_ref[1:, :] = jnp.zeros((7, dn.shape[-1]), jnp.float32)
        else:
            def f(ph, pp, wv):
                core = _tile_core(ph, pp, wv, d=d)
                return _tile_localstats(core, mask_v, d=d, k_pad=k_pad)

            _, vjp = jax.vjp(f, ph_ref[:], pp_ref[:], w_ref[:])
            dph, dpp, dw = vjp((dlocal_ref[0:1, :], dstats_ref[:]))
        dph_ref[:] = dph
        dpp_ref[:] = dpp
        accumulate(i, dw_ref, dw)

    in_specs_ls = [pot_spec, pot_spec, w_spec, row8_spec]
    ins_ls = [ph_t, pp_t, w, mask]
    if use_norm:
        in_specs_ls += [row8_spec]
        ins_ls += [norm_t]
    in_specs_ls += [row8_spec, stats_spec]
    ins_ls += [dlocal_t, dstats]
    out2 = pl.pallas_call(
        kernel_ls,
        grid=grid,
        compiler_params=params,
        in_specs=in_specs_ls,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins_ls)

    if use_norm:
        dph1, dpp1, dw1, dn1 = out1
        dph2, dpp2, dw2, dn2 = out2
        return dph1 + dph2, dpp1 + dpp2, dw1 + dw2, dn1 + dn2
    dph1, dpp1, dw1 = out1
    dph2, dpp2, dw2 = out2
    return dph1 + dph2, dpp1 + dpp2, dw1 + dw2


# --------------------------------------------------- differentiable wrapper


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14)
)
def _fused_core(ph_t, pp_t, w, eps_t, mask, norm_t, tile, tile_bwd, d, s, k,
                k_pad, interpret, use_norm, gen_eps=False):
    # gen_eps: eps_t is an int32 (1,) SMEM seed; ε is generated in-kernel
    # at tile_bwd-column granularity (forward AND backward regenerate the
    # same bits — see _tile_prng_normals).
    return _fwd_call(ph_t, pp_t, w, eps_t, mask, norm_t,
                     tile=tile, d=d, s=s, k=k, k_pad=k_pad,
                     interpret=interpret, use_norm=use_norm,
                     gen_eps=gen_eps, gen_chunk=tile_bwd)


def _fused_core_fwd(ph_t, pp_t, w, eps_t, mask, norm_t, tile, tile_bwd, d, s,
                    k, k_pad, interpret, use_norm, gen_eps=False):
    out = _fwd_call(ph_t, pp_t, w, eps_t, mask, norm_t,
                    tile=tile, d=d, s=s, k=k, k_pad=k_pad,
                    interpret=interpret, use_norm=use_norm,
                    gen_eps=gen_eps, gen_chunk=tile_bwd)
    return out, (ph_t, pp_t, w, eps_t, mask, norm_t)


def _fused_core_bwd(tile, tile_bwd, d, s, k, k_pad, interpret, use_norm,
                    gen_eps, res, cts):
    # The recompute backward holds ~2× the forward's live VMEM set (every
    # forward slot plus its cotangent), so it runs at its own smaller tile.
    ph_t, pp_t, w, eps_t, mask, norm_t = res
    dz_t, dlr_t, dmu_t, dlocal_t, dstats = cts
    grads = _bwd_call(
        ph_t, pp_t, w, eps_t, mask, norm_t, dz_t, dlr_t, dmu_t, dlocal_t,
        dstats, tile=tile_bwd, d=d, s=s, k=k, k_pad=k_pad,
        interpret=interpret, use_norm=use_norm, gen_eps=gen_eps,
    )
    if use_norm:
        dph_t, dpp_t, dw, dn = grads
        return dph_t, dpp_t, dw, None, None, dn
    dph_t, dpp_t, dw = grads
    return dph_t, dpp_t, dw, None, None, None


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ------------------------------------------------------------- public entry


def pack_expected(exp: GmmExpected, k_pad: int) -> jnp.ndarray:
    """(K_pad, W_LANES) block: [log π | E[log|Λ|] | E[μᵀΛμ] | E[Λμ] | E[Λ]]."""
    k, d = exp.prec_mean.shape
    w = jnp.zeros((k_pad, w_lanes(d)), jnp.float32)
    w = w.at[:, 0].set(_NEG)  # padded components → softmax weight 0
    w = w.at[:k, 0].set(exp.log_pi.astype(jnp.float32))
    w = w.at[:k, 1].set(exp.logdet.astype(jnp.float32))
    w = w.at[:k, 2].set(exp.quad.astype(jnp.float32))
    w = w.at[:k, 3 : 3 + d].set(exp.prec_mean.astype(jnp.float32))
    w = w.at[:k, 3 + d : 3 + d + d * d].set(
        exp.prec.reshape(k, d * d).astype(jnp.float32)
    )
    return w


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def log_rho_fused(
    pot_h: jnp.ndarray,
    pot_p: jnp.ndarray,
    exp: GmmExpected,
    tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pre-softmax log ρ (N, K) from the light ρ-kernel (differentiable).

    The component-parallel companion of ``combine_fused``: each K-shard
    computes its own log ρ, the global normalizer is
    ``gmm.lse_over_components(log_rho, axis_comp)`` (one pmax + one psum
    over the mesh axis), and the result feeds ``combine_fused``'s
    ``log_norm`` so the heavy kernel weights by GLOBAL responsibilities.
    """
    n, d = pot_h.shape
    k = exp.log_pi.shape[0]
    k_pad = _round_up(k, 8)
    tile = min(tile, _round_up(n, 128))
    n_pad = _round_up(n, tile)
    ph_t = jnp.zeros((d, n_pad), jnp.float32).at[:, :n].set(
        pot_h.astype(jnp.float32).T)
    pp_t = jnp.ones((d, n_pad), jnp.float32).at[:, :n].set(
        pot_p.astype(jnp.float32).T)
    w = pack_expected(exp, k_pad)
    rho_t = _rho_core(ph_t, pp_t, w, tile, d, k_pad, interpret)
    return rho_t[:k, :n].T


@functools.partial(
    jax.jit, static_argnames=("num_samples", "tile", "tile_bwd", "interpret")
)
def combine_fused(
    pot_h: jnp.ndarray,
    pot_p: jnp.ndarray,
    exp: GmmExpected,
    eps: jnp.ndarray | None,
    num_samples: int,
    scale=1.0,
    tile: int = 128,
    tile_bwd: int = 128,
    interpret: bool = False,
    log_norm: jnp.ndarray | None = None,
    seed: jnp.ndarray | None = None,
):
    """Fused combine+KL+sampling+stats. Differentiable (custom VJP).

    pot_h, pot_p: (N, d) encoder potentials; eps: (S, N, K, d) standard
    normals. Returns (z (S, N, K, d), log_resp (N, K), mean (N, K, d),
    local (N,), GmmSuffStats scaled by ``scale``) — exactly the pieces
    svae.forward consumes; chol/cov/ezz never leave the kernel.

    ``eps=None`` with ``seed`` (int32 scalar/(1,) array): ε is generated
    IN-KERNEL by the hardware PRNG (Box–Muller, same recipe as the
    tinystep megakernel), removing the threefry op and the (S, N, K, d)
    HBM round-trip — measured 0.28 ms/step of the 2.5 ms bigk step.
    Forward and recompute-backward regenerate identical bits per
    tile_bwd-column sub-block. TPU-only (the interpreter has no PRNG
    lowering); ε is not returned — recover it as L̃ᵀ(z − μ̃) if needed
    (that identity is how the HW parity test pins this path).

    ``log_norm`` (N,): externally-computed log-normalizer for component
    parallelism (see ``log_rho_fused``); responsibilities become
    exp(log ρ − log_norm) instead of the in-kernel softmax over local K,
    and the returned ``local`` / suff-stats rows cover only this shard's
    components (callers psum the Σ_k reductions over the comp axis).
    """
    n, d = pot_h.shape
    k = exp.log_pi.shape[0]
    s = num_samples
    k_pad = _round_up(k, 8)
    tile = min(tile, _round_up(n, 128))
    tile_bwd = min(tile_bwd, tile)
    # tile_bwd divides tile (both powers of two), so one n_pad serves both
    # grids.
    assert tile % tile_bwd == 0, (tile, tile_bwd)
    n_pad = _round_up(n, tile)

    ph_t = jnp.zeros((d, n_pad), jnp.float32).at[:, :n].set(
        pot_h.astype(jnp.float32).T)
    # Padded columns get unit precision → J̃ = I + E[Λ]: safely PSD.
    pp_t = jnp.ones((d, n_pad), jnp.float32).at[:, :n].set(
        pot_p.astype(jnp.float32).T)
    w = pack_expected(exp, k_pad)
    gen_eps = eps is None
    if gen_eps:
        assert seed is not None, "combine_fused: eps=None requires seed"
        # Seed mode leans on the tile % tile_bwd == 0 invariant asserted
        # above: the forward generates bits in tile_bwd-lane sub-blocks so
        # the backward (running at tile_bwd) regenerates them exactly.
        eps_t = jnp.asarray(seed, jnp.int32).reshape((1,))
    else:
        # eps (S, N, K, d) → row blocks [(s·d + i)·K_pad + k] on (n) lanes.
        e_r = jnp.transpose(eps.astype(jnp.float32), (0, 3, 2, 1))
        e_r = jnp.pad(e_r, ((0, 0), (0, 0), (0, k_pad - k), (0, 0)))
        eps_t = jnp.pad(
            e_r.reshape(s * d * k_pad, n), ((0, 0), (0, n_pad - n))
        )
    mask = jnp.zeros((8, n_pad), jnp.float32).at[:, :n].set(1.0)

    use_norm = log_norm is not None
    if use_norm:
        # Padded columns get +1e30 → resp = exp(log ρ − 1e30) = 0 exactly
        # (the local-softmax path bounds padded resp by construction; the
        # external-normalizer path must do it explicitly).
        norm_t = jnp.full((8, n_pad), -_NEG, jnp.float32).at[0, :n].set(
            log_norm.astype(jnp.float32))
    else:
        norm_t = jnp.zeros((8, n_pad), jnp.float32)

    z_t, lr_t, mu_t, local_t, stats = _fused_core(
        ph_t, pp_t, w, eps_t, mask, norm_t, tile, tile_bwd, d, s, k, k_pad,
        interpret, use_norm, gen_eps
    )

    z = z_t.reshape(s, d, k_pad, n_pad)[:, :, :k, :n]
    z = jnp.transpose(z, (0, 3, 2, 1))  # (S, N, K, d)
    log_resp = lr_t[:k, :n].T  # (N, K)
    mean = jnp.transpose(
        mu_t.reshape(d, k_pad, n_pad)[:, :k, :n], (2, 1, 0)
    )  # (N, K, d)
    local = local_t[0, :n]  # (N,)
    counts = stats[:k, 0]
    mean_stat = stats[:k, 1 : 1 + d]
    scatter = stats[:k, 1 + d : 1 + d + d * d].reshape(k, d, d)
    scatter = 0.5 * (scatter + jnp.swapaxes(scatter, -1, -2))
    suff = GmmSuffStats(
        counts=scale * counts,
        mean_stat=scale * mean_stat,
        scatter_stat=scale * scatter,
    )
    return z, log_resp, mean, local, suff
