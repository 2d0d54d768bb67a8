#!/usr/bin/env python
"""Train the Student-t mixture (SMM) baseline with natural-gradient VMP.

Heavy-tailed variant of the pure-GMM workload (svax.pgm.smm): robust to
outliers via Gamma scale augmentation. Example:

    python experiments/train_smm.py --steps 200 --dof 4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-components", "-K", type=int, default=10)
    p.add_argument("--num-classes", type=int, default=5)
    p.add_argument("--num-per-class", type=int, default=100)
    p.add_argument("--outliers", type=int, default=0, help="inject N gross outliers")
    p.add_argument("--dof", type=float, default=4.0, help="Student-t degrees of freedom")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--rho", type=float, default=1.0)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--kappa", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=20)
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument(
        "--unroll", type=int, default=1,
        help="megakernel engine only: complete steps per grid iteration "
             "(opt-in ~9%% GMM throughput win at 8; >1 trades away the "
             "bit-exact chunk-split/resume contract -- see "
             "mixstep_pallas.train_chunk)")
    p.add_argument(
        "--engine", choices=["xla", "megakernel", "auto"], default="xla",
        help="hot-loop engine: megakernel = whole-train-step Pallas kernel "
        "(full batch, d=2); auto = megakernel when supported on TPU",
    )
    p.add_argument("--plot", type=str, default="")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from svax.data import load_pinwheel
    from svax.models import smm_baseline
    from svax.pgm import gmm, smm

    train, test = load_pinwheel(
        num_classes=args.num_classes, num_per_class=args.num_per_class, seed=args.seed
    )
    if args.outliers:
        rng = np.random.default_rng(args.seed)
        train = np.concatenate(
            [train, rng.standard_normal((args.outliers, 2)) * 50.0]
        )
    x_train = jnp.asarray(train, dtype=jnp.float32)
    x_test = jnp.asarray(test, dtype=jnp.float32)
    n = x_train.shape[0]
    batch = args.batch_size if args.batch_size > 0 else n

    prior = gmm.make_prior(args.num_components, 2, alpha=args.alpha, kappa=args.kappa)
    key = jax.random.PRNGKey(args.seed)
    k_init, k_data = jax.random.split(key)
    state = smm_baseline.init_state(k_init, prior, x_train)
    step = jax.jit(
        smm_baseline.make_train_step(prior, args.rho, num_total=n, dof=args.dof)
    )

    mega = None
    if args.engine != "xla":
        from svax.train.loop import (
            make_mixture_megakernel_runner,
            mixture_megakernel_unsupported_reason,
        )

        reason = mixture_megakernel_unsupported_reason(
            data_dim=2, batch_full=batch >= n, rho=args.rho,
        )
        if args.engine == "megakernel":
            if reason is not None:
                p.error(f"--engine megakernel: {reason}")
            mega = make_mixture_megakernel_runner(
                prior, rho=args.rho, dof=args.dof, unroll=args.unroll
            )
        elif reason is None and jax.devices()[0].platform == "tpu":
            mega = make_mixture_megakernel_runner(
                prior, rho=args.rho, dof=args.dof, unroll=args.unroll
            )

    print(
        f"devices={jax.devices()} n={n} K={args.num_components} "
        f"dof={args.dof} engine={'megakernel' if mega is not None else 'xla'}"
    )
    if mega is not None:
        state_w, _ = mega(state, x_train, 1)
        jax.block_until_ready(state_w.nat.dir_nat)
        t0 = time.perf_counter()
        t = 0
        while t < args.steps:
            todo = min(args.eval_every, args.steps - t)
            state, metrics = mega(state, x_train, todo)
            t += todo
            print(json.dumps({"step": t, "elbo": float(metrics["elbo"][-1])}))
        jax.block_until_ready(state.nat.dir_nat)
    else:
        state_w, _ = step(state, x_train[:batch])
        jax.block_until_ready(state_w.nat.dir_nat)

        t0 = time.perf_counter()
        for t in range(args.steps):
            if batch < n:
                k_data, k = jax.random.split(k_data)
                xb = x_train[jax.random.choice(k, n, (batch,), replace=False)]
            else:
                xb = x_train
            state, metrics = step(state, xb)
            if (t + 1) % args.eval_every == 0 or t == 0:
                print(json.dumps({"step": t + 1, "elbo": float(metrics["elbo"])}))
        jax.block_until_ready(state.nat.dir_nat)
    print(f"steps/sec: {args.steps / (time.perf_counter() - t0):.1f}")

    if args.plot:
        from svax.utils import viz

        exp = gmm.expected_params(state.nat)
        resp, _, _ = smm.e_step_obs(x_train, exp, args.dof)
        viz.plot_gmm_clusters(
            np.asarray(x_train), np.asarray(resp), state.nat, args.plot,
            title=f"pinwheel SMM K={args.num_components} dof={args.dof}",
        )
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
