#!/usr/bin/env python
"""Fused decoder-likelihood kernel vs XLA on TPU: correctness + speed.

BigK MNIST shapes: N=1024, R=K·S=100, Dh=200, D=784. Compares the fused
Pallas forward/backward against the jnp twin (the program XLA runs today).

    python benchmarks/bench_decoder.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svax.ops import decoder_pallas as dk

    n, r, dh, d = 1024, 100, 200, 784
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((n, r, dh)), jnp.float32) * 0.3
    w = jnp.asarray(rng.standard_normal((dh, d)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal(d), jnp.float32) * 0.1
    x = jnp.asarray((rng.uniform(size=(n, d)) > 0.5), jnp.float32)

    print(f"backend={jax.default_backend()} N={n} R={r} Dh={dh} D={d}")

    def val_grad(fn):
        @jax.jit
        def f(h, w, b):
            return jax.value_and_grad(
                lambda hh, ww, bb: jnp.sum(fn(hh, ww, bb, x)), argnums=(0, 1, 2)
            )(h, w, b)

        return f

    fns = {
        "xla_twin": val_grad(dk.bernoulli_loglik_reference),
        "fused": val_grad(lambda hh, ww, bb, xx: dk.fused_bernoulli_loglik(hh, ww, bb, xx)),
    }
    results = {}
    for name, f in fns.items():
        (v, g) = f(h, w, b)
        jax.block_until_ready(g[0])
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            v, g = f(h, w, b)
        jax.block_until_ready(g[0])
        dt = (time.perf_counter() - t0) / reps
        results[name] = (float(v), g, dt)
        print(f"{name:>9}: {dt*1e3:8.3f} ms/iter (fwd+bwd)  value={float(v):.1f}")

    v1, g1, _ = results["xla_twin"]
    v2, g2, _ = results["fused"]
    assert abs(v1 - v2) / abs(v1) < 1e-5, (v1, v2)
    for a, c, nm in zip(g1, g2, ("hbar", "wbar", "bbar")):
        err = float(jnp.max(jnp.abs(a - c)) / (jnp.max(jnp.abs(a)) + 1e-30))
        print(f"max rel err {nm}: {err:.2e}")
        assert err < 1e-4, nm
    print("fused decoder kernel CORRECT vs XLA twin")


if __name__ == "__main__":
    main()
