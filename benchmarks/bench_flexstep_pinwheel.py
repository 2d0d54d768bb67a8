#!/usr/bin/env python
"""Flexstep megakernel at the PINWHEEL shape: the headline-unification bench.

The shipped pinwheel-svae quality recipe (aug_noise=0.4 + best-of-2
restarts, BASELINE.md seed table) cannot run on the tinystep megakernel —
its gate rejects augmentation — but `make_megakernel_runner` routes
aug>0 workloads to the generalized flexstep kernel via the pre-augmented
batch stack (svax/train/loop.py). This script measures that exact path at
the pinwheel shape (N=400 full-batch stack, d_in=d_lat=2, K=10, S=4,
MLPs 50-50) so the headline steps/s and the quality recipe can finally
describe the same trainer (VERDICT r3 item 1):

  1. throughput — paired-chunk marginal timing of the runner (which
     includes the per-chunk batch-stack broadcast + noise generation, the
     real cost of running the recipe through this engine);
  2. quality smoke — one full 15k-step recipe run (aug 0.4) + IW-1000,
     printed next to the -5.41 pure-GMM bar (the 8-seed sweep lives in
     experiments/seed_sweep.py --engine mega).

Usage: python benchmarks/bench_flexstep_pinwheel.py [--t-steps 5000]
           [--precision highest|default] [--skip-quality]
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
    ap.add_argument("--t-steps", type=int, default=5000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--aug-noise", type=float, default=0.4)
    ap.add_argument("--precision", choices=["highest", "default"],
                    default="highest")
    ap.add_argument("--skip-quality", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from svax.data import load_pinwheel
    from svax.models import evaluation
    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_megakernel_runner

    train, test = load_pinwheel(seed=0)
    x = jnp.asarray(train, dtype=jnp.float32)
    xt = jnp.asarray(test, dtype=jnp.float32)
    n = x.shape[0]
    k, d, s, lr, rho = 10, 2, 4, 1e-3, 0.05
    hidden = (50, 50)
    prec = (jax.lax.Precision.HIGHEST if args.precision == "highest"
            else jax.lax.Precision.DEFAULT)
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=s,
                        num_total=n, nn_precision=prec)
    prior = jax.tree.map(lambda a: a.astype(jnp.float32),
                         gmm.make_prior(k, d, kappa=0.05))
    opt = optax.adam(lr)

    def fresh_state(seed):
        st = svae_step.init_state(jax.random.PRNGKey(seed), d, config,
                                  prior, opt, hidden, hidden, data=x)
        return jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, st)

    # force_flex: tinystep owns aug>0 full-batch d=2 workloads since its
    # in-kernel augmentation landed; this bench measures FLEXSTEP at the
    # pinwheel shape specifically (the engine A/B's other arm).
    runner = make_megakernel_runner(
        config, prior, lr=lr, rho=rho, batch_size=0,
        aug_noise=args.aug_noise, encoder_hidden=hidden,
        decoder_hidden=hidden, force_flex=True)

    # ------------------------------------------------------------ throughput
    t1 = args.t_steps

    def run(st, t_steps, seed):
        t0 = time.perf_counter()
        st, mets = runner(st, x, t_steps, seed=seed)
        float(st.pgm_nat.dir_nat[0])  # host-read sync through the tunnel
        return st, mets, time.perf_counter() - t0

    st, mets, _ = run(fresh_state(0), t1, 0)      # compile T and 2T
    st, mets, _ = run(st, 2 * t1, 1)
    marginals, singles = [], []
    for i in range(args.reps):
        st, mets, dt1 = run(st, t1, 10 + 2 * i)
        st, mets, dt2 = run(st, 2 * t1, 11 + 2 * i)
        marginals.append((dt2 - dt1) / t1)
        singles.append(dt1 / t1)
    mar = statistics.median(marginals)
    nl = float(mets["elbo"][-1])
    assert nl == nl, "NaN in flexstep pinwheel training"
    out = {
        "metric": "flexstep_megakernel_pinwheel_steps_per_sec",
        "precision": args.precision,
        "aug_noise": args.aug_noise,
        "value": round(1.0 / mar, 1),
        "us_per_step_marginal": round(1e6 * mar, 2),
        "us_per_step_wall_T": round(1e6 * statistics.median(singles), 2),
        "t_steps_per_launch": t1,
    }

    # --------------------------------------------------------- quality smoke
    if not args.skip_quality:
        iw_eval = jax.jit(
            lambda nn, nat, key: jnp.mean(evaluation.svae_iw_loglik(
                nn, nat, xt, key, config, num_samples=1000)))
        best = None
        for r in range(2):  # best-of-2 restarts, TRAIN-elbo selected
            stq = fresh_state(r * 1000)
            mq = None
            for c in range(15):
                stq, mq = runner(stq, x, 1000, seed=r * 7777)
            tr = float(mq["elbo"][-1])
            if best is None or tr > best[0]:
                best = (tr, stq)
        _, stq = best
        iw = float(iw_eval(stq.nn_params, stq.pgm_nat,
                           jax.random.PRNGKey(999)))
        out["quality_iw_per_point"] = round(iw, 3)
        out["gmm_bar"] = -5.41
    print(json.dumps(out))


if __name__ == "__main__":
    main()
