#!/usr/bin/env python
"""Measure steps/sec on the current backend for each BASELINE.json config.

Single-chip shapes (the DP config runs without the mesh here — its psum
path is validated separately on the virtual mesh). Appends rows suitable
for BASELINE.md. Run on TPU:  python benchmarks/bench_configs.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_svae(name, dataset, k, d, s, hidden, batch, chunk=50, n_chunks=6):
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
    state = svae_step.init_state(
        key, input_dim, config, prior, opt, tuple(hidden), tuple(hidden), data=x
    )
    step = svae_step.make_train_step(config, prior, opt, rho=0.1)

    if batch >= n:
        runner = make_scan_runner(step, chunk)
        args = (x,)
    else:
        runner = make_minibatch_scan_runner(step, chunk)
        idx = jax.random.randint(key, (chunk, batch), 0, n)
        args = (x[idx],)

    state, m = runner(state, *args, key)
    jax.block_until_ready(state.pgm_nat.dir_nat)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, m = runner(state, *args, jax.random.fold_in(key, i))
    jax.block_until_ready(state.pgm_nat.dir_nat)
    dt = time.perf_counter() - t0
    sps = n_chunks * chunk / dt
    print(json.dumps({
        "config": name, "dataset": dataset, "K": k, "latent": d, "S": s,
        "batch": batch, "steps_per_sec": round(sps, 1),
        "elbo_finite": bool(jnp.isfinite(m["elbo"][-1])),
    }), flush=True)


def main() -> None:
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    bench_svae("pinwheel-svae", "pinwheel", 10, 2, 4, (50, 50), 0)
    bench_svae("auto-svae", "auto", 10, 4, 4, (100, 100), 64)
    bench_svae("mnist-svae", "mnist", 10, 8, 1, (200, 200), 256)
    bench_svae("bigk (single-chip)", "mnist", 100, 10, 1, (200, 200), 1024,
               chunk=20, n_chunks=3)


if __name__ == "__main__":
    main()
