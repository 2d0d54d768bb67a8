"""Hardware check: fused MLP-decoder backward with n_pad > tile.

The round-2 advisor found the backward kernel's grid put the accumulated
(s,k) axis OUTERMOST, so the per-n-tile dy/dc output blocks were revisited
non-consecutively — undefined on Pallas TPU, silently corrupting W3/b3
gradients whenever n_pad > tile (e.g. the shipped bigk-dp config, batch
1024 at tile 512). Interpret-mode CI cannot observe the hardware revisit
ordering, so this script verifies the fixed (n-tiles, s·k) grid on the
REAL chip.

Oracle choice: the XLA bf16 mirror is NOT a tight oracle on TPU — MXU
bf16 rounding differs from Mosaic's at ~1e-2 on nearly every element. The
sharp test is SELF-consistency: the same kernel at tile = n_pad (a single
n-tile — no output-block revisits, so immune to the revisit bug) against
small tiles (the multi-tile accumulation path). Measured on v5e: forward
and dz are BITWISE identical across tilings, dW agrees to ~1e-6 (pure f32
reduction order); only the bias grads move ~2.5e-3 — those are
cancellation-heavy row sums whose relative error is legitimately
amplified by summation order. Tolerances: 1e-4 for dz/dW, 1e-2 for db; a
corrupted accumulation is O(1) off on dW3/db3 (the dy/dc path), so both
bars stay sharp. A loose check against the XLA mirror (5e-2) additionally
guards gross math errors.

Run:  python benchmarks/verify_decoder_bwd_tpu.py
Exits non-zero on mismatch. Result recorded in BASELINE.md.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from svax.nets import mlp as nets
from svax.ops import decoder_mlp_pallas as dmp


def _mirror(params, z, x):
    bf, f32 = jnp.bfloat16, jnp.float32
    h1 = jnp.tanh(jnp.dot(z.astype(bf), params[0]["w"].astype(bf),
                          preferred_element_type=f32) + params[0]["b"])
    h2 = jnp.tanh(jnp.dot(h1.astype(bf), params[1]["w"].astype(bf),
                          preferred_element_type=f32) + params[1]["b"])
    o = jnp.dot(h2.astype(bf), params[2]["w"].astype(bf),
                preferred_element_type=f32) + params[2]["b"]
    rowsum = jnp.sum(jax.nn.log_sigmoid(-o), axis=-1)
    y = jnp.dot(x.astype(bf), params[2]["w"].astype(bf).T,
                preferred_element_type=f32)
    c = jnp.dot(x.astype(bf), params[2]["b"].astype(bf),
                preferred_element_type=f32)
    t = jnp.einsum("snkh,nh->snk", h2, y) + c[None, :, None]
    return t + rowsum


def _grads(fn, params, z, w):
    def loss(p, zz):
        return jnp.sum(w * fn(p, zz))
    return jax.jit(jax.grad(loss, argnums=(0, 1)))(params, z)


def _rel(a, b):
    scale = max(1.0, float(jnp.max(jnp.abs(b))))
    return float(jnp.max(jnp.abs(a - b))) / scale


def check(name, *, s, n, k, d, dh, dd, tile, seed=0):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    params = [jax.tree.map(lambda p: p.astype(jnp.float32), layer)
              for layer in nets.mlp_init(key, [d, dh, dh, dd])]
    z = jnp.asarray(rng.standard_normal((s, n, k, d)).astype(np.float32))
    x = jnp.asarray((rng.random((n, dd)) > 0.5).astype(np.float32))
    w = jnp.cos(jnp.arange(s * n * k, dtype=jnp.float32)).reshape(s, n, k)
    n_pad = -(-n // 128) * 128

    multi = _grads(lambda p, zz: dmp.bernoulli_mlp_loglik_fused(
        p, zz, x, tile=tile), params, z, w)
    single = _grads(lambda p, zz: dmp.bernoulli_mlp_loglik_fused(
        p, zz, x, tile=n_pad), params, z, w)
    mirror = _grads(lambda p, zz: _mirror(p, zz, x), params, z, w)

    ok = True
    rel_dz = _rel(multi[1], single[1])
    ok &= rel_dz < 1e-4
    lines = [f"dz {rel_dz:.1e}"]
    leaf_names = [f"d{pn}{i}" for i in (1, 2, 3) for pn in ("w", "b")]
    for nm, a, b in zip(leaf_names, jax.tree.leaves(multi[0]),
                        jax.tree.leaves(single[0])):
        tol = 1e-2 if nm.startswith("db") else 1e-4
        r = _rel(a, b)
        ok &= r < tol
        lines.append(f"{nm} {r:.1e}")
    rel_mirror = max(_rel(a, b) for a, b in zip(
        jax.tree.leaves(multi), jax.tree.leaves(mirror)))
    ok &= rel_mirror < 5e-2
    print(f"[{name}] tiles={n_pad // tile}  self: " + "  ".join(lines)
          + f"  | mirror {rel_mirror:.1e}  {'ok' if ok else 'FAIL'}")
    return ok


def main():
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    ok = True
    # bigk-dp geometry: batch 1024, default tile 512 → 2 n-tiles — exactly
    # the shipped config the round-2 bug corrupted.
    ok &= check("bigk", s=1, n=1024, k=100, d=10, dh=200, dd=784,
                tile=512, seed=0)
    # Many small tiles: 5 n-tiles × (s·k_pad)=32 inner sweeps.
    ok &= check("multitile", s=2, n=640, k=13, d=4, dh=32, dd=48,
                tile=128, seed=1)
    print("RESULT:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
