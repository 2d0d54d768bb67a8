#!/usr/bin/env python
"""Step-cost A/B: diagonal vs full-covariance encoder head (round 4).

The full-covariance head (`SvaeConfig.encoder_head="full"`, SURVEY.md
§9.4's combine generalized to dense per-point precisions) is strictly
more expressive than the reference-recalled diagonal head; this measures
what it costs per step on the XLA engine (the megakernels are gated to
the diagonal head — svax/train/loop.py). Steady-state steps/s via the
bench_chunks methodology: compile a scan chunk, then time repeated
chunk dispatches for a few seconds.

Run on TPU:  python benchmarks/bench_encoder_head.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_one(name, dataset, k, d, s, hidden, batch, chunk, head,
              seconds_target=3.0):
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
        likelihood=meta["likelihood"], num_total=n, encoder_head=head,
    )
    prior = gmm.make_prior(k, d)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    state0 = svae_step.init_state(
        key, input_dim, config, prior, opt, tuple(hidden), tuple(hidden),
        data=x,
    )
    step = svae_step.make_train_step(config, prior, opt, rho=0.1)

    if batch >= n:
        runner = make_scan_runner(step, chunk)
        args = (x,)
    else:
        runner = make_minibatch_scan_runner(step, chunk)
        idx = jax.random.randint(key, (chunk, batch), 0, n)
        args = (x[idx],)
    t0 = time.perf_counter()
    state, m = runner(state0, *args, key)  # compile + warm
    jax.block_until_ready(state.pgm_nat.dir_nat)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < seconds_target:
        state, m = runner(state, *args, jax.random.fold_in(key, reps))
        jax.block_until_ready(state.pgm_nat.dir_nat)
        reps += 1
    sps = reps * chunk / (time.perf_counter() - t0)
    row = {"config": name, "head": head, "steps_per_sec": round(sps, 1),
           "compile_s": round(compile_s, 1),
           "elbo_finite": bool(jnp.isfinite(m["elbo"][-1]))}
    print(json.dumps(row), flush=True)
    return sps


def bench_pair(name, *shape, chunk):
    diag = bench_one(name, *shape, chunk, "diag")
    full = bench_one(name, *shape, chunk, "full")
    print(json.dumps({"config": name, "full_over_diag_cost":
                      round(diag / full, 2)}), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="pinwheel only")
    args = p.parse_args()
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    bench_pair("pinwheel-svae", "pinwheel", 10, 2, 4, (50, 50), 0, chunk=1000)
    if not args.quick:
        bench_pair("auto-svae", "auto", 10, 4, 4, (100, 100), 64, chunk=500)
        bench_pair("mnist-svae", "mnist", 10, 8, 1, (200, 200), 256, chunk=200)


if __name__ == "__main__":
    main()
