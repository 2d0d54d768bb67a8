#!/usr/bin/env python
"""Measure steps/sec vs scan-chunk size per BASELINE config (VERDICT r1 #9).

The per-dispatch latency through the TPU tunnel is ~10–50 ms, so the chunk
size (steps per device-resident lax.scan) sets how much of the machine you
see. This sweeps chunk sizes per config shape and prints one JSON row per
point; the winning chunks become the configs' pinned defaults.

Run on TPU:  python benchmarks/bench_chunks.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(name, dataset, k, d, s, hidden, batch, chunks, seconds_target=3.0):
    import jax
    import jax.numpy as jnp
    import optax

    from svax.data import load_dataset
    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_minibatch_scan_runner, make_scan_runner

    train, _, meta = load_dataset(dataset, seed=0)
    x = jnp.asarray(train, dtype=jnp.float32)
    n, input_dim = x.shape
    batch = min(batch or n, n)
    config = SvaeConfig(
        latent_dim=d, num_components=k, num_samples=s,
        likelihood=meta["likelihood"], num_total=n,
    )
    prior = gmm.make_prior(k, d)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    state0 = svae_step.init_state(
        key, input_dim, config, prior, opt, tuple(hidden), tuple(hidden), data=x
    )
    step = svae_step.make_train_step(config, prior, opt, rho=0.1)

    best = None
    for chunk in chunks:
        if batch >= n:
            runner = make_scan_runner(step, chunk)
            args = (x,)
        else:
            runner = make_minibatch_scan_runner(step, chunk)
            idx = jax.random.randint(key, (chunk, batch), 0, n)
            args = (x[idx],)
        state, m = runner(state0, *args, key)  # compile + warm
        jax.block_until_ready(state.pgm_nat.dir_nat)
        # Enough repeats to fill ~seconds_target of steady-state.
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < seconds_target:
            state, m = runner(state, *args, jax.random.fold_in(key, reps))
            jax.block_until_ready(state.pgm_nat.dir_nat)
            reps += 1
        sps = reps * chunk / (time.perf_counter() - t0)
        row = {"config": name, "chunk": chunk, "steps_per_sec": round(sps, 1),
               "elbo_finite": bool(jnp.isfinite(m["elbo"][-1]))}
        print(json.dumps(row), flush=True)
        if best is None or sps > best[1]:
            best = (chunk, sps)
    print(json.dumps({"config": name, "best_chunk": best[0],
                      "best_steps_per_sec": round(best[1], 1)}), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer chunk points")
    args = p.parse_args()
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    if args.quick:
        bench("pinwheel-svae", "pinwheel", 10, 2, 4, (50, 50), 0, (200, 1000))
        bench("bigk-single-chip", "mnist", 100, 10, 1, (200, 200), 1024, (20,))
    else:
        bench("pinwheel-svae", "pinwheel", 10, 2, 4, (50, 50), 0,
              (100, 500, 1000))
        bench("auto-svae", "auto", 10, 4, 4, (100, 100), 64, (100, 500))
        bench("mnist-svae", "mnist", 10, 8, 1, (200, 200), 256, (50, 200))
        bench("bigk-single-chip", "mnist", 100, 10, 1, (200, 200), 1024,
              (20, 50))


if __name__ == "__main__":
    main()
