#!/usr/bin/env python
"""Fused Pallas E-step kernel: on-TPU correctness vs the jnp twin + speed.

Compares three implementations of E-step + sufficient statistics on the
large-K workload (BASELINE config #5 shape):
  1. L1 einsum path        (gmm.e_step_obs + gmm.suff_stats_obs)
  2. feature-matmul twin   (estep_pallas.e_step_stats_reference)
  3. fused Pallas kernel   (estep_pallas._fused_kernel_call via public API)

Run:  python benchmarks/bench_estep.py [--n 65536] [--k 128] [--d 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--k", type=int, default=128)
    p.add_argument("--d", type=int, default=10)
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from svax.ops import estep_pallas
    from svax.pgm import gmm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.n, args.d)), dtype=jnp.float32)
    prior = gmm.make_prior(args.k, args.d)
    nat = gmm.init_variational(jax.random.PRNGKey(0), prior, x)
    exp = gmm.expected_params(nat)

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} N={args.n} K={args.k} d={args.d}")

    @jax.jit
    def einsum_path(x):
        resp, ev = gmm.e_step_obs(x, exp)
        return gmm.suff_stats_obs(x, resp), ev

    @jax.jit
    def twin_path(x):
        return estep_pallas.e_step_stats_reference(x, exp)

    def fused_path(x):
        return estep_pallas.e_step_stats_fused(x, exp, interpret_fallback=not on_tpu)

    results = {}
    for name, fn in [("einsum", einsum_path), ("twin", twin_path), ("fused", fused_path)]:
        out, ev = fn(x)
        jax.block_until_ready(ev)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, ev = fn(x)
        jax.block_until_ready(ev)
        dt = (time.perf_counter() - t0) / args.reps
        results[name] = (out, ev, dt)
        print(f"{name:>8}: {dt*1e3:8.3f} ms/iter")

    # Correctness: fused vs einsum.
    ref_stats, ref_ev, _ = results["einsum"]
    fus_stats, fus_ev, _ = results["fused"]
    for a, b, nm in zip(fus_stats, ref_stats, ("counts", "mean", "scatter")):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
        print(f"max rel err {nm}: {err:.2e}")
        assert err < 5e-5, f"{nm} mismatch"
    ev_err = float(jnp.max(jnp.abs(fus_ev - ref_ev)))
    print(f"max abs err evidence: {ev_err:.2e}")
    assert ev_err < 1e-3
    print("fused kernel CORRECT vs einsum path")


if __name__ == "__main__":
    main()
