#!/usr/bin/env python
"""Mixture megakernel on real TPU: hardware parity + throughput.

Mirrors benchmarks/bench_tinystep.py for the pure-mixture baselines
(BASELINE config #2 and the SMM row):

  1. parity — T steps at the pinwheel-gmm geometry through (a) the
     Mosaic-compiled mixstep kernel and (b) the jitted XLA step (the
     mixture step is deterministic, so parity needs no eps injection);
  2. throughput — T steps per launch, paired-chunk marginal timing
     (T(2c)−T(c))/c which cancels fixed dispatch + tunnel cost, next to
     the XLA scan-chunk number (12979 steps/s GMM / 12739 SMM in round 2
     — the op-count-bound floor this kernel attacks).

Usage: python benchmarks/bench_mixstep.py [--t-steps 2000] [--skip-parity]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-steps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
    # Pad-occupancy probe (BASELINE.md mixstep headroom note): override the
    # geometry to measure whether pad cells convert to time at this depth —
    # e.g. --n-points 512 -K 8 fills the (K_pad, N_pad) planes exactly
    # (100% occupancy) vs the default 400/10 (49%).
    ap.add_argument("--n-points", type=int, default=0,
                    help="0 = the pinwheel 400; else synthetic N")
    ap.add_argument("-K", "--num-components", type=int, default=10)
    ap.add_argument("--unroll", type=int, default=8,
                    help="complete steps per grid iteration (in-kernel "
                         "unroll; 1 = the round-3 one-step-per-iteration "
                         "form)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from svax.data import load_pinwheel
    from svax.models import gmm_baseline, smm_baseline
    from svax.ops import mixstep_pallas as msp
    from svax.pgm import gmm
    from svax.train.loop import make_scan_runner

    train, _ = load_pinwheel(seed=0)
    x = jnp.asarray(train, dtype=jnp.float32)
    if args.n_points:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((args.n_points, 2)), jnp.float32)
    n = x.shape[0]
    k, rho = args.num_components, 1.0
    prior = jax.tree.map(lambda a: a.astype(jnp.float32),
                         gmm.make_prior(k, 2, kappa=0.05))
    key = jax.random.PRNGKey(0)

    workloads = [
        ("gmm", 0.0, gmm_baseline,
         lambda: gmm_baseline.make_train_step(prior, rho, num_total=n)),
        ("smm", 4.0, smm_baseline,
         lambda: smm_baseline.make_train_step(prior, rho, num_total=n,
                                              dof=4.0)),
    ]

    for name, dof, baseline_mod, make_step in workloads:
        state0 = baseline_mod.init_state(key, prior, x)

        if not args.skip_parity:
            t_par = 5
            st_k, mets_k = msp.train_chunk(state0, prior, x, rho=rho,
                                           t_steps=t_par, dof=dof,
                                           unroll=args.unroll)
            jax.block_until_ready(st_k.nat.dir_nat)
            step_j = jax.jit(make_step())
            st_o = state0
            for _ in range(t_par):
                st_o, mets_o = step_j(st_o, x)
            jax.block_until_ready(st_o.nat.dir_nat)
            nat_rel = max(
                float(jnp.max(jnp.abs(la - lb) / (jnp.abs(lb) + 1e-6)))
                for la, lb in zip(jax.tree.leaves(st_k.nat),
                                  jax.tree.leaves(st_o.nat)))
            ev_k = float(mets_k["local_evidence"][-1])
            ev_o = float(mets_o["local_evidence"])
            print(f"[parity {name}] nat max rel Δ={nat_rel:.2e}  "
                  f"evidence kernel={ev_k:.4f} oracle={ev_o:.4f}")
            assert nat_rel < 3e-3, f"HW parity failure on {name} naturals"
            assert abs(ev_k - ev_o) / (abs(ev_o) + 1e-6) < 1e-3

        # -------------------------------------- throughput (paired chunks)
        t1 = args.t_steps

        def run(st, t_steps):
            t0 = time.perf_counter()
            st, mets = msp.train_chunk(st, prior, x, rho=rho,
                                       t_steps=t_steps, dof=dof,
                                       unroll=args.unroll)
            float(st.nat.dir_nat[0])  # host-read sync through the tunnel
            return st, time.perf_counter() - t0

        st, _ = run(state0, t1)       # compile T and 2T variants
        st, _ = run(st, 2 * t1)
        marginals, singles = [], []
        for _ in range(args.reps):
            st, dt1 = run(st, t1)
            st, dt2 = run(st, 2 * t1)
            marginals.append((dt2 - dt1) / t1)
            singles.append(dt1 / t1)
        m = statistics.median(marginals)
        ev = float(gmm_baseline.evaluate(st.nat, prior, x,
                                         num_total=n)["elbo"])
        assert np.isfinite(ev), f"non-finite ELBO in {name} megakernel run"
        n_pad = -(-n // 128) * 128
        k_pad = -(-k // 8) * 8
        print(json.dumps({
            "metric": f"mixstep_megakernel_{name}_steps_per_sec",
            "value": round(1.0 / m, 1),
            "us_per_step_marginal": round(1e6 * m, 3),
            "us_per_step_wall_T": round(1e6 * statistics.median(singles), 3),
            "t_steps_per_launch": t1,
            "unroll": args.unroll,
            "n": n, "k": k,
            "plane_occupancy": round((n * k) / (n_pad * k_pad), 2),
            "final_elbo": round(ev, 2),
        }))

        if not args.skip_xla:
            # XLA scan path at the tuned chunk for reference (same paired
            # method: scan chunks of c and 2c).
            raw = make_step()
            step = lambda s, b, key: raw(s, b)  # noqa: E731
            c = 500
            run_c = make_scan_runner(step, c)
            run_2c = make_scan_runner(step, 2 * c)

            def run_xla(st, runner, steps):
                t0 = time.perf_counter()
                st, _ = runner(st, x, key)
                float(st.nat.dir_nat[0])
                return st, time.perf_counter() - t0

            st, _ = run_xla(state0, run_c, c)
            st, _ = run_xla(st, run_2c, 2 * c)
            marginals = []
            for _ in range(args.reps):
                st, dt1 = run_xla(st, run_c, c)
                st, dt2 = run_xla(st, run_2c, 2 * c)
                marginals.append((dt2 - dt1) / c)
            m = statistics.median(marginals)
            print(json.dumps({
                "metric": f"xla_scan_{name}_steps_per_sec",
                "value": round(1.0 / m, 1),
                "us_per_step_marginal": round(1e6 * m, 3),
                "scan_chunk": c,
            }))


if __name__ == "__main__":
    main()
