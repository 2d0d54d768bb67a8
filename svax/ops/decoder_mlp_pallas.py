"""Fully-fused Bernoulli MLP-decoder Pallas kernel (fwd + recompute bwd).

After the fused combine landed, the bf16 decoder is the binding stage of
the big-K step (~2.2 of 2.9 ms): XLA still streams the (S·N·K, Dh) hidden
activations and the (S·N·K, D) logits through HBM in both directions.
This kernel computes the whole decoder log-likelihood

    h1 = act(z W1 + b1);  h2 = act(h1 W2 + b2);  o = h2 W3 + b3
    ll = ⟨x, o⟩ + Σ_D log σ(−o)          (x-free decomposition, nets.mlp)

per tile with h1/h2/o living only in VMEM. Two design points defeat the
failure modes that sank the round-1 row-sum kernel:

* **Transposed slot layouts.** Activations are (features, rows) blocks —
  features on sublanes, rows on lanes — so nothing pads to 128 lanes
  (a (rows, 10) or (rows, 200) block would).
* **A (S·K_pad, N-tiles) grid.** Rows are ordered (s, k, n) with n minor,
  so each kernel instance serves ONE (s,k) pair and an n-tile — the
  x-dependent pieces (y = x W3ᵀ, c = x·b3, both tiny) are indexed by the
  n-tile id and broadcast over (s,k): no in-kernel gather exists.

The x-dependence of ⟨x, o⟩ rides through (y, c), which are computed
OUTSIDE the kernel from (x, W3, b3) — so their cotangents carry the
t-term's W3/b3 gradients without the kernel ever touching x. The backward
is one recompute kernel applying ``jax.vjp`` of the tile function in VMEM
(dW/db accumulate across the sequential grid). Its grid is transposed to
(N-tiles, S·K_pad) — the accumulated (s,k) axis innermost — so the
per-n-tile dy/dc output blocks are only ever revisited on consecutive
grid steps (the Pallas TPU accumulation contract; verified on hardware
with n_pad > tile, benchmarks/verify_decoder_bwd_tpu.py). bf16 dots with
f32 accumulation match the ``nn_compute_dtype="bfloat16"`` XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# --------------------------------------------------------------- tile math


def _tile_ll(z, w1t, b1, w2t, b2, w3t, b3, y, c, *, act):
    """ll row for one (s,k) pair over an n-tile. All slot-layout 2-D.

    z (d_pad, T); wNt (out, in) transposed weights; bN (out, 1);
    y (Dh, T); c (1, T). Dots run in bf16 with f32 accumulation
    (preferred_element_type) — the compute-dtype contract of the bf16
    decoder path. Returns ll (1, T) f32.
    """
    f32 = jnp.float32
    bf = jnp.bfloat16
    h1 = act(jnp.dot(w1t.astype(bf), z.astype(bf),
                     preferred_element_type=f32) + b1)  # (Dh1, T)
    h2 = act(jnp.dot(w2t.astype(bf), h1.astype(bf),
                     preferred_element_type=f32) + b2)  # (Dh2, T)
    o = jnp.dot(w3t.astype(bf), h2.astype(bf),
                preferred_element_type=f32) + b3  # (D, T)
    rowsum = jnp.sum(jax.nn.log_sigmoid(-o), axis=0, keepdims=True)  # (1, T)
    t = jnp.sum(h2 * y, axis=0, keepdims=True) + c  # (1, T)
    return t + rowsum


# ------------------------------------------------------------ pallas calls


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _fwd_call(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t, *, tile, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sk_d, n_pad = z_t.shape
    dh1 = w1t.shape[0]
    dh2 = w2t.shape[0]
    dd = w3t.shape[0]
    d_pad = w1t.shape[1]
    sk = sk_d // d_pad
    grid = (sk, n_pad // tile)

    def kernel(z_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               y_ref, c_ref, ll_ref):
        ll = _tile_ll(
            z_ref[:], w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:],
            w3_ref[:], b3_ref[:], y_ref[:], c_ref[0:1, :], act=jnp.tanh,
        )
        # ll lives in row 0 of an 8-sublane band (block shapes must keep
        # the last two dims (8·a, 128·b)); rows 1..7 are zero padding.
        ll_ref[0] = jnp.concatenate(
            [ll, jnp.zeros((7, ll.shape[-1]), jnp.float32)], axis=0
        )

    fixed = lambda *_: (0, 0)  # noqa: E731
    ll = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((d_pad, tile), lambda g1, g2: (g1, g2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh1, d_pad), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh1, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, dh1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dd, dh2), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dd, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, tile), lambda g1, g2: (0, g2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda g1, g2: (0, g2),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile), lambda g1, g2: (g1, 0, g2),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sk, 8, n_pad), jnp.float32),
        interpret=interpret,
    )(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t)
    return ll[:, 0, :]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _bwd_call(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t, dll,
              *, tile, interpret):
    """Recompute backward: jax.vjp of the tile fn; dW/db/dy accumulate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sk_d, n_pad = z_t.shape
    dh1 = w1t.shape[0]
    dh2 = w2t.shape[0]
    dd = w3t.shape[0]
    d_pad = w1t.shape[1]
    sk = sk_d // d_pad
    n_tiles = n_pad // tile
    # Grid order (n_tiles, sk): the accumulated (s,k) axis MUST be the
    # innermost (minor) grid dim so the dy/dc output blocks — indexed by
    # the n-tile alone — are revisited only on CONSECUTIVE grid steps.
    # Pallas TPU keeps an output block resident only across consecutive
    # iterations; with the axes the other way round (the round-2 bug) each
    # dy block was re-entered once per (s,k) after n_tiles-1 intervening
    # steps, which is undefined and corrupts W3/b3 grads when n_pad > tile.
    grid = (n_tiles, sk)
    fixed = lambda *_: (0, 0)  # noqa: E731

    def kernel(z_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               y_ref, c_ref, dll_ref,
               dz_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
               db3_ref, dy_ref, dc_ref):
        gn = pl.program_id(0)   # n-tile (outer)
        gk = pl.program_id(1)   # (s,k) pair (inner)

        def f(z, w1, db1_, w2, db2_, w3, db3_, y, c):
            return _tile_ll(z, w1, db1_, w2, db2_, w3, db3_, y, c,
                            act=jnp.tanh)

        _, vjp = jax.vjp(
            f, z_ref[:], w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:],
            w3_ref[:], b3_ref[:], y_ref[:], c_ref[0:1, :],
        )
        dz, dw1, db1, dw2, db2, dw3, db3, dy, dc = vjp(dll_ref[0, 0:1, :])
        dz_ref[:] = dz
        first = jnp.logical_and(gn == 0, gk == 0)

        # dy/dc accumulate over gk (the inner (s,k) sweep) per n-tile;
        # dW/db over the whole grid. Both revisit patterns are consecutive
        # under this grid order, so the accumulation is well-defined.
        dc8 = jnp.concatenate(
            [dc, jnp.zeros((7, dc.shape[-1]), jnp.float32)], axis=0
        )

        @pl.when(gk == 0)
        def _init_y():
            dy_ref[:] = dy
            dc_ref[:] = dc8

        @pl.when(gk > 0)
        def _acc_y():
            dy_ref[:] = dy_ref[:] + dy
            dc_ref[:] = dc_ref[:] + dc8

        @pl.when(first)
        def _init_w():
            dw1_ref[:] = dw1
            db1_ref[:] = db1
            dw2_ref[:] = dw2
            db2_ref[:] = db2
            dw3_ref[:] = dw3
            db3_ref[:] = db3

        @pl.when(jnp.logical_not(first))
        def _acc_w():
            dw1_ref[:] = dw1_ref[:] + dw1
            db1_ref[:] = db1_ref[:] + db1
            dw2_ref[:] = dw2_ref[:] + dw2
            db2_ref[:] = db2_ref[:] + db2
            dw3_ref[:] = dw3_ref[:] + dw3
            db3_ref[:] = db3_ref[:] + db3

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((d_pad, tile), lambda gn, gk: (gk, gn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh1, d_pad), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh1, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, dh1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dd, dh2), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dd, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, tile), lambda gn, gk: (0, gn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda gn, gk: (0, gn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda gn, gk: (gk, 0, gn),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d_pad, tile), lambda gn, gk: (gk, gn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh1, d_pad), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh1, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, dh1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dd, dh2), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dd, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh2, tile), lambda gn, gk: (0, gn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda gn, gk: (0, gn),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(z_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(w1t.shape, jnp.float32),
            jax.ShapeDtypeStruct(b1.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2t.shape, jnp.float32),
            jax.ShapeDtypeStruct(b2.shape, jnp.float32),
            jax.ShapeDtypeStruct(w3t.shape, jnp.float32),
            jax.ShapeDtypeStruct(b3.shape, jnp.float32),
            jax.ShapeDtypeStruct(y_t.shape, jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ),
        interpret=interpret,
    )(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t, dll)
    return outs


# --------------------------------------------------- differentiable wrapper


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _core(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t, tile, interpret):
    return _fwd_call(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t,
                     tile=tile, interpret=interpret)


def _core_fwd(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t, tile, interpret):
    out = _fwd_call(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t,
                    tile=tile, interpret=interpret)
    return out, (z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t)


def _core_bwd(tile, interpret, res, dll):
    z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t = res
    # Re-band the (sk, N) cotangent into the 8-sublane block layout the
    # kernel's dll input spec requires (row 0 carries the data).
    dll8 = jnp.zeros((dll.shape[0], 8, dll.shape[1]), jnp.float32)
    dll8 = dll8.at[:, 0, :].set(dll)
    dz, dw1, db1, dw2, db2, dw3, db3, dy, dc8 = _bwd_call(
        z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t, dll8,
        tile=tile, interpret=interpret,
    )
    return dz, dw1, db1, dw2, db2, dw3, db3, dy, dc8
_core.defvjp(_core_fwd, _core_bwd)


# ------------------------------------------------------------- public entry


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def bernoulli_mlp_loglik_fused(
    params: list,
    z: jnp.ndarray,
    x: jnp.ndarray,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Bernoulli decoder log-likelihood: (S, N, K) from z (S, N, K, d).

    Two tanh hidden layers (the framework's decoder family). Matches
    ``nets.bernoulli_loglik_decomposed(..., compute_dtype=bfloat16)``
    numerics (bf16 dots, f32 accumulation). Differentiable via the
    recompute-backward kernel.
    """
    assert len(params) == 3, "fused MLP decoder supports 2 hidden layers"
    s, n, k, d = z.shape
    dd = params[-1]["w"].shape[-1]
    d_pad = _round_up(d, 8)
    k_pad = _round_up(k, 8)
    tile = min(tile, _round_up(n, 128))
    n_pad = _round_up(n, tile)

    f32 = jnp.float32
    # z → (S, K, d, N) → pad → (S·K_pad·d_pad, N_pad) slot rows.
    z_r = jnp.transpose(z.astype(f32), (0, 2, 3, 1))  # (S, K, d, N)
    z_r = jnp.pad(z_r, ((0, 0), (0, k_pad - k), (0, d_pad - d),
                        (0, n_pad - n)))
    z_t = z_r.reshape(s * k_pad * d_pad, n_pad)

    w1t = jnp.pad(params[0]["w"].astype(f32).T, ((0, 0), (0, d_pad - d)))
    b1 = params[0]["b"].astype(f32)[:, None]
    w2t = params[1]["w"].astype(f32).T
    b2 = params[1]["b"].astype(f32)[:, None]
    w3t = params[2]["w"].astype(f32).T
    b3 = params[2]["b"].astype(f32)[:, None]

    # x-dependent pieces (tiny): y = x W3ᵀ (N, Dh2), c = x·b3 (N,).
    bf = jnp.bfloat16
    y = jnp.dot(x.astype(bf), params[2]["w"].astype(bf).T,
                preferred_element_type=f32)  # (N, Dh2)
    c = jnp.dot(x.astype(bf), params[2]["b"].astype(bf),
                preferred_element_type=f32)  # (N,)
    y_t = jnp.pad(y.T, ((0, 0), (0, n_pad - n)))  # (Dh2, N_pad)
    c_t = jnp.zeros((8, n_pad), f32).at[0, :n].set(c)

    ll = _core(z_t, w1t, b1, w2t, b2, w3t, b3, y_t, c_t, tile, interpret)
    # (S·K_pad, N_pad) → (S, N, K)
    ll = ll.reshape(s, k_pad, n_pad)[:, :k, :n]
    return jnp.transpose(ll, (0, 2, 1))
