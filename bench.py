#!/usr/bin/env python
"""Headline benchmark: pinwheel SVAE (K=10) training steps/sec.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N/BASELINE}

Methodology (BASELINE.md): the reference implementation is unavailable
(empty mount, SURVEY.md §0), so the baseline is this repo's own float64
CPU run of the mathematically identical algorithm with per-step host
dispatch — the TF1 ``session.run``-per-step execution model the reference
used. The TPU number runs the same config in float32 with the train loop
inside one jitted ``lax.scan`` (the TPU-native execution model). Config:
full-batch pinwheel N=400, K=10, latent 2, S=4 MC samples, MLPs 50-50.
"""

from __future__ import annotations

import json
import time

# Measured on this machine's CPU backend (see BASELINE.md for details).
BASELINE_CPU_STEPS_PER_SEC = 20.4


def main() -> None:
    import jax

    try:
        # Persistent compile cache: cold remote-TPU compiles cost minutes;
        # re-runs should not.
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from svax.data import load_pinwheel
    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_scan_runner

    train, _ = load_pinwheel(seed=0)
    x = jnp.asarray(train, dtype=jnp.float32)
    n = x.shape[0]
    config = SvaeConfig(latent_dim=2, num_components=10, num_samples=4, num_total=n)
    prior = gmm.make_prior(10, 2)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(
        key, 2, config, prior, opt, (50, 50), (50, 50), data=x
    )
    step = svae_step.make_train_step(config, prior, opt, rho=0.05)

    # Device-resident scan chunks: per-dispatch latency through the TPU
    # tunnel is ~25 ms, so big chunks are required to measure the machine
    # rather than the tunnel. Chunk sweep (benchmarks/bench_chunks.py):
    # 100→1858, 500→7227, 1000→8799, 2000→6313 steps/s — 1000 is the knee.
    chunk = 1000
    runner = make_scan_runner(step, chunk)

    # Warm-up compile + one chunk (cold TPU compile can take ~2 min).
    state, metrics = runner(state, x, key)
    jax.block_until_ready(state.pgm_nat.dir_nat)

    # Median-of-chunks timing for jitter robustness.
    n_chunks = 7
    times = []
    k = key
    for i in range(n_chunks):
        k = jax.random.fold_in(k, i)
        t0 = time.perf_counter()
        state, metrics = runner(state, x, k)
        jax.block_until_ready(state.pgm_nat.dir_nat)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    steps_per_sec = chunk / dt
    final_elbo = float(metrics["elbo"][-1])
    assert final_elbo == final_elbo, "NaN ELBO in benchmark run"
    print(
        json.dumps(
            {
                "metric": "pinwheel_svae_K10_steps_per_sec",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_CPU_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
