#!/usr/bin/env python
"""Headline benchmark: pinwheel SVAE (K=10) training steps/sec.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N/BASELINE}

Methodology (BASELINE.md): the reference implementation is unavailable
(empty mount, SURVEY.md §0), so the baseline is this repo's own float64
CPU run of the mathematically identical algorithm with per-step host
dispatch — the TF1 ``session.run``-per-step execution model the reference
used. The TPU number runs the same config in float32 through the
tiny-step Pallas megakernel (``svax/ops/tinystep_pallas.py``): ONE kernel
program executes 10000 complete train steps per launch with all state
VMEM-resident, INCLUDING the shipped seed-robustness recipe's input-noise
augmentation in-kernel (oracle-tested against the XLA step; the engine
reproduces the canonical 8-seed quality table, BASELINE.md). Falls back
to the jitted ``lax.scan`` XLA path (8.8–9.1k steps/s) if the megakernel
errors. Config: full-batch pinwheel N=400, K=10, latent 2, S=4 MC
samples, MLPs 50-50, aug sigma 0.4.
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
    prior = jax.tree.map(
        lambda a: a.astype(jnp.float32), gmm.make_prior(10, 2, kappa=0.05)
    )
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(
        key, 2, config, prior, opt, (50, 50), (50, 50), data=x
    )
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state
    )
    chunk = 1000
    n_chunks = 7
    mega_chunk = 10000  # ~31 µs/step of fixed per-launch cost (dispatch +
    mega_reps = 5       # tunnel RTT) amortizes: 11.9k steps/s at T=1000 →
    #                     17.4k at T=10000 (marginal rate 19.2k, BASELINE.md)

    def run_megakernel():
        # Whole-train-step Pallas megakernel running THE SHIPPED QUALITY
        # RECIPE (in-kernel input-noise augmentation sigma=0.4, the
        # BASELINE.md seed-table recipe): 10000 steps per launch, all
        # state VMEM-resident; single-pass MXU dots. This exact engine
        # produced the round-5 32-seed canonical tables (best-of-5: IW
        # -5.40±0.28, median -5.33, 21/32 crossing the -5.41 pure-GMM
        # bar — runs/seed_sweep_r5_mega_rs5_32.json), so the headline
        # steps/s and the quality claim describe the same trainer;
        # augmentation costs 0.9% (57.26 vs 56.74 us/step same-session
        # A/B, benchmarks/bench_tinystep.py).
        from svax.ops import tinystep_pallas as tsp

        st = state
        st, mets = tsp.train_chunk(
            st, prior, x, lr=1e-3, rho=0.05, t_steps=mega_chunk,
            num_samples=4, seed=0, precision=jax.lax.Precision.DEFAULT,
            aug_noise=0.4,
        )
        float(st.pgm_nat.dir_nat[0])
        times = []
        for i in range(mega_reps):
            t0 = time.perf_counter()
            st, mets = tsp.train_chunk(
                st, prior, x, lr=1e-3, rho=0.05, t_steps=mega_chunk,
                num_samples=4, seed=1 + i,
                precision=jax.lax.Precision.DEFAULT, aug_noise=0.4,
            )
            # A scalar host read is the sync barrier: through the remote
            # tunnel, block_until_ready on a fresh dispatch can return
            # before execution completes (measured 0.5 ms for an 80 ms
            # chunk), silently timing the enqueue instead of the kernel.
            float(st.pgm_nat.dir_nat[0])
            times.append(time.perf_counter() - t0)
        times.sort()
        final = float(mets["neg_loss"][-1])
        assert final == final, "NaN loss in megakernel benchmark"
        return mega_chunk / times[len(times) // 2]

    def run_xla_scan():
        step = svae_step.make_train_step(config, prior, opt, rho=0.05)
        # Chunk sweep (benchmarks/bench_chunks.py): 100→1858, 500→7227,
        # 1000→8799, 2000→6313 steps/s — 1000 is the knee.
        runner = make_scan_runner(step, chunk)
        st, metrics = runner(state, x, key)
        float(st.pgm_nat.dir_nat[0])
        times = []
        k = key
        for i in range(n_chunks):
            k = jax.random.fold_in(k, i)
            t0 = time.perf_counter()
            st, metrics = runner(st, x, k)
            float(st.pgm_nat.dir_nat[0])  # host-read sync (see above)
            times.append(time.perf_counter() - t0)
        times.sort()
        final_elbo = float(metrics["elbo"][-1])
        assert final_elbo == final_elbo, "NaN ELBO in benchmark run"
        return chunk / times[len(times) // 2]

    engine = "megakernel"
    try:
        steps_per_sec = run_megakernel()
    except Exception:
        # Loud fallback: a megakernel failure must not masquerade as the
        # headline number — the traceback goes to stderr (the driver reads
        # the single stdout JSON line) and the engine field says which
        # path produced the value.
        import traceback

        traceback.print_exc()
        engine = "xla-scan-fallback"
        steps_per_sec = run_xla_scan()
    print(
        json.dumps(
            {
                "metric": "pinwheel_svae_K10_steps_per_sec",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_CPU_STEPS_PER_SEC, 2),
                "engine": engine,
            }
        )
    )


if __name__ == "__main__":
    main()
