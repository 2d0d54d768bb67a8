#!/usr/bin/env python
"""Train the pure-GMM baseline on pinwheel with natural-gradient VMP.

BASELINE.json config #2: "Pure GMM via natural-gradient VMP on pinwheel
(conjugate NIW/Dirichlet updates, no neural net)". See SURVEY.md §4.2 for
the call stack this script drives.

Example:
    python experiments/train_gmm.py --num-components 10 --steps 200
    python experiments/train_gmm.py --batch-size 64 --rho 0.3 --steps 2000
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
    p.add_argument("--config", choices=["pinwheel-gmm"], default="")
    p.add_argument("--num-components", "-K", type=int, default=10)
    p.add_argument("--num-classes", type=int, default=5, help="pinwheel arms")
    p.add_argument("--num-per-class", type=int, default=100)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=0, help="0 = full batch")
    p.add_argument("--rho", type=float, default=1.0, help="CVI step size")
    p.add_argument("--rho-decay", type=float, default=0.0, help="rho_t = rho/(1+decay*t)")
    p.add_argument("--alpha", type=float, default=1.0, help="Dirichlet prior")
    p.add_argument("--kappa", type=float, default=0.05, help="NIW prior scale")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=20)
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument("--init", choices=["random", "kmeanspp"], default="random")
    p.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    p.add_argument("--fused-kernel", action="store_true", help="use the Pallas fused E-step")
    p.add_argument(
        "--unroll", type=int, default=1,
        help="megakernel engine only: complete steps per grid iteration "
             "(opt-in ~9%% GMM throughput win at 8; >1 trades away the "
             "bit-exact chunk-split/resume contract -- see "
             "mixstep_pallas.train_chunk)")
    p.add_argument(
        "--engine", choices=["xla", "megakernel", "auto"], default="xla",
        help="hot-loop engine: megakernel = whole-train-step Pallas kernel "
        "(full batch, d=2, constant rho); auto = megakernel when supported "
        "on TPU, else xla",
    )
    p.add_argument("--plot", type=str, default="", help="write cluster plot PNG here")
    p.add_argument("--logfile", type=str, default="")
    args = p.parse_args()

    from configs import apply_config

    apply_config(args, p)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from svax.data import load_pinwheel
    from svax.models import gmm_baseline
    from svax.pgm import gmm

    train, test, train_labels, _ = load_pinwheel(
        num_classes=args.num_classes,
        num_per_class=args.num_per_class,
        seed=args.seed,
        return_labels=True,
    )
    dtype = jnp.float32
    x_train = jnp.asarray(train, dtype=dtype)
    x_test = jnp.asarray(test, dtype=dtype)
    n = x_train.shape[0]
    batch = args.batch_size if args.batch_size > 0 else n

    prior = gmm.make_prior(
        args.num_components, 2, alpha=args.alpha, kappa=args.kappa, dtype=dtype
    )
    key = jax.random.PRNGKey(args.seed)
    k_init, k_data = jax.random.split(key)
    if args.init == "kmeanspp":
        import jax.numpy as _jnp

        from svax.pgm.init import init_variational_kmeanspp

        nat0 = init_variational_kmeanspp(prior, train, seed=args.seed)
        state = gmm_baseline.GmmTrainState(nat=nat0, step=_jnp.zeros((), _jnp.int32))
    else:
        state = gmm_baseline.init_state(k_init, prior, x_train)

    rho = (
        args.rho
        if args.rho_decay == 0.0
        else (lambda t: args.rho / (1.0 + args.rho_decay * t))
    )
    if args.dp:
        from svax.parallel import mesh as pmesh

        dmesh = pmesh.make_data_mesh()
        step = pmesh.data_parallel_gmm_step(
            gmm_baseline.make_train_step(
                prior, rho, num_total=n, axis_name="data", fused=args.fused_kernel
            ),
            dmesh,
        )
    else:
        step = jax.jit(
            gmm_baseline.make_train_step(prior, rho, num_total=n, fused=args.fused_kernel)
        )

    mega = None
    if args.engine != "xla":
        from svax.train.loop import (
            make_mixture_megakernel_runner,
            mixture_megakernel_unsupported_reason,
        )

        reason = mixture_megakernel_unsupported_reason(
            data_dim=2, batch_full=batch >= n, rho=rho, data_parallel=args.dp,
        )
        if reason is None and args.fused_kernel:
            reason = "--fused-kernel selects the XLA-path E-step engine"
        if args.engine == "megakernel":
            if reason is not None:
                p.error(f"--engine megakernel: {reason}")
            mega = make_mixture_megakernel_runner(
                prior, rho=args.rho, unroll=args.unroll)
        elif reason is None and jax.devices()[0].platform == "tpu":
            mega = make_mixture_megakernel_runner(
                prior, rho=args.rho, unroll=args.unroll)

    logf = open(args.logfile, "a") if args.logfile else None
    print(
        f"devices={jax.devices()} n={n} batch={batch} K={args.num_components}"
        f" engine={'megakernel' if mega is not None else 'xla'}"
    )

    def _eval_row(t, elbo):
        ev = gmm_baseline.evaluate(state.nat, prior, x_test, num_total=n)
        row = {
            "step": t,
            "elbo": elbo,
            "test_evidence_per_point": float(ev["evidence_per_point"]),
        }
        print(json.dumps(row))
        if logf:
            logf.write(json.dumps(row) + "\n")

    if mega is not None:
        state_w, _ = mega(state, x_train, 1)
        jax.block_until_ready(state_w.nat.dir_nat)
        t0 = time.perf_counter()
        t = 0
        while t < args.steps:
            todo = min(args.eval_every, args.steps - t)
            state, metrics = mega(state, x_train, todo)
            t += todo
            _eval_row(t, float(metrics["elbo"][-1]))
        jax.block_until_ready(state.nat.dir_nat)
        dt = time.perf_counter() - t0
    else:
        # Warm up compile before timing.
        state_w, _ = step(state, x_train[:batch])
        jax.block_until_ready(state_w.nat.dir_nat)

        t0 = time.perf_counter()
        for t in range(args.steps):
            if batch < n:
                k_data, k = jax.random.split(k_data)
                idx = jax.random.choice(k, n, (batch,), replace=False)
                xb = x_train[idx]
            else:
                xb = x_train
            state, metrics = step(state, xb)
            if (t + 1) % args.eval_every == 0 or t == 0:
                _eval_row(t + 1, float(metrics["elbo"]))
        jax.block_until_ready(state.nat.dir_nat)
        dt = time.perf_counter() - t0
    counts = np.asarray(
        gmm.e_step_obs(x_train, gmm.expected_params(state.nat))[0].sum(0)
    )
    print(f"steps/sec: {args.steps / dt:.1f}")
    print(f"component counts: {np.round(counts, 1).tolist()}")
    from svax.models import evaluation

    pred = evaluation.gmm_predictive_log_prob(state.nat, x_test)
    resp_final, _ = gmm.e_step_obs(x_train, gmm.expected_params(state.nat))
    print(
        json.dumps(
            {
                "test_predictive_loglik_per_point": float(pred.mean()),
                "train_cluster_purity": evaluation.cluster_purity(
                    resp_final, train_labels
                ),
            }
        )
    )
    if args.plot:
        from svax.utils import viz

        resp_full, _ = gmm.e_step_obs(x_train, gmm.expected_params(state.nat))
        viz.plot_gmm_clusters(
            np.asarray(x_train), np.asarray(resp_full), state.nat, args.plot,
            title=f"pinwheel GMM K={args.num_components}",
        )
        print(f"wrote {args.plot}")
    if logf:
        logf.close()


if __name__ == "__main__":
    main()
