#!/usr/bin/env python
"""Decompose the bigk end-state step: fused-combine vs fused-decoder time.

The roofline row (benchmarks/mfu.py) shows the end-state step is
compute-bound at ~2.5 ms; this splits that between its two Pallas
programs by timing each kernel's forward+backward standalone at the bigk
shape (N=1024, K=100, d=10, S=1, hidden 200-200, D=784).

Methodology: R repetitions inside one jitted lax.scan, with the carry
perturbed by the gradient each iteration (defeats CSE/DCE); per-call time
is (T(2R) − T(R)) / R, which cancels dispatch + tunnel-sync overhead.
Sync barriers are scalar host reads (block_until_ready is not a safe
barrier through the remote tunnel — see bench.py).

Run on TPU:  python benchmarks/bench_kernel_split.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N, K, D_LAT, S, D_OBS = 1024, 100, 10, 1, 784
HID = 200
R = 50


def _timed(fn, arg, reps_list=(R, 2 * R)):
    import numpy as np

    out = {}
    for reps in reps_list:
        f = fn(reps)
        r = f(arg)
        float(r.ravel()[0])  # warm + sync
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = f(arg)
            float(r.ravel()[0])
            ts.append(time.perf_counter() - t0)
        out[reps] = float(np.median(ts))
    r1, r2 = reps_list
    return (out[r2] - out[r1]) / (r2 - r1)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from svax.ops.combine_pallas import combine_fused
    from svax.ops.decoder_mlp_pallas import bernoulli_mlp_loglik_fused
    from svax.pgm import gmm

    rng = np.random.default_rng(0)
    prior = gmm.make_prior(K, D_LAT)
    exp = gmm.expected_params(prior)
    pot_h = jnp.asarray(rng.standard_normal((N, D_LAT)), jnp.float32)
    pot_p = jnp.asarray(rng.random((N, D_LAT)) + 0.5, jnp.float32)
    eps = jnp.asarray(rng.standard_normal((S, N, K, D_LAT)), jnp.float32)
    x = jnp.asarray((rng.random((N, D_OBS)) > 0.7), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((S, N, K, D_LAT)), jnp.float32)
    params = [
        {"w": jnp.asarray(rng.standard_normal((D_LAT, HID)) * 0.1, jnp.float32),
         "b": jnp.zeros((HID,), jnp.float32)},
        {"w": jnp.asarray(rng.standard_normal((HID, HID)) * 0.1, jnp.float32),
         "b": jnp.zeros((HID,), jnp.float32)},
        {"w": jnp.asarray(rng.standard_normal((HID, D_OBS)) * 0.1, jnp.float32),
         "b": jnp.zeros((D_OBS,), jnp.float32)},
    ]

    def combine_loop(reps):
        def body(ph, _):
            def loss(p):
                z, lr, mu, local, stats = combine_fused(p, pot_p, exp, eps, S)
                return (jnp.sum(z) + jnp.sum(lr) + jnp.sum(local)
                        + jnp.sum(stats.counts))

            g = jax.grad(loss)(ph)
            return ph + 1e-20 * g, None

        return jax.jit(
            lambda ph: jax.lax.scan(body, ph, None, length=reps)[0]
        )

    def decoder_loop(reps):
        def body(z, _):
            def loss(zz):
                return jnp.sum(bernoulli_mlp_loglik_fused(params, zz, x))

            g = jax.grad(loss)(z)
            return z + 1e-20 * g, None

        return jax.jit(
            lambda z: jax.lax.scan(body, z, None, length=reps)[0]
        )

    t_comb = _timed(combine_loop, pot_h)
    t_dec = _timed(decoder_loop, z0)
    # Decoder MXU work incl. the recompute-backward's forward replay:
    # fwd + recompute + dW/dz passes ≈ 4× the forward MACs.
    rows = S * N * K
    macs_fwd = rows * (D_LAT * HID + HID * HID + HID * D_OBS)
    print(json.dumps({
        "shape": {"n": N, "k": K, "d": D_LAT, "s": S, "hidden": HID,
                  "d_obs": D_OBS},
        "combine_fwd_bwd_ms": round(t_comb * 1e3, 3),
        "decoder_fwd_bwd_ms": round(t_dec * 1e3, 3),
        "decoder_mxu_tflops_at_4x_fwd": round(4 * 2 * macs_fwd / t_dec / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
