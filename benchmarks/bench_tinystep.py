#!/usr/bin/env python
"""Tiny-step megakernel on real TPU: hardware parity + headline throughput.

Two stages:
  1. parity — run a few steps at the headline geometry with INJECTED eps
     through (a) the Mosaic-compiled tinystep kernel and (b) the XLA
     train step, and compare updated state (guards against
     interpret-vs-hardware divergence, e.g. grid revisit bugs).
  2. throughput — in-kernel PRNG mode, T steps per launch, median-of-
     chunks timing; prints steps/s next to the XLA scan-chunk number
     (8821 steps/s in round 2 = the op-count-bound floor this kernel
     attacks, docs/DESIGN.md §3b).

Usage: python benchmarks/bench_tinystep.py [--t-steps 1000] [--skip-parity]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-steps", type=int, default=1000)
    ap.add_argument("--chunks", type=int, default=7)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--precision", choices=["highest", "default"],
                    default="highest",
                    help="MXU passes for the THROUGHPUT stage (parity "
                         "always runs HIGHEST); 'default' = single-pass "
                         "bf16 inputs, f32 accumulate")
    ap.add_argument("--aug-noise", type=float, default=0.0,
                    help="in-kernel input-noise augmentation sigma for the "
                         "throughput stage (the seed-robustness recipe; "
                         "one extra HW-PRNG draw per step)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    import optax

    from svax.data import load_pinwheel
    from svax.models.svae import SvaeConfig
    from svax.ops import tinystep_pallas as tsp
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_scan_runner

    train, _ = load_pinwheel(seed=0)
    x = jnp.asarray(train, dtype=jnp.float32)
    n = x.shape[0]
    k, s, lr, rho = 10, 4, 1e-3, 0.05
    config = SvaeConfig(latent_dim=2, num_components=k, num_samples=s,
                        num_total=n)
    prior = jax.tree.map(lambda a: a.astype(jnp.float32),
                         gmm.make_prior(k, 2, kappa=0.05))
    opt = optax.adam(lr)
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(key, 2, config, prior, opt, (50, 50),
                                 (50, 50), data=x)
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state)

    if not args.skip_parity:
        t_par = 3
        rng = np.random.default_rng(7)
        eps = jnp.asarray(
            rng.standard_normal((t_par, s, n, k, 2)).astype(np.float32))
        t0 = time.perf_counter()
        st_k, mets_k = tsp.train_chunk(state, prior, x, lr=lr, rho=rho,
                                       t_steps=t_par, eps=eps)
        jax.block_until_ready(st_k.pgm_nat.dir_nat)
        print(f"[parity] kernel compile+run: {time.perf_counter()-t0:.1f}s")

        # XLA oracle at the same eps.
        from svax.models import svae as svae_mod
        from svax.pgm import natgrad

        def one_step(st, e):
            def loss_fn(nn_params):
                out = svae_mod.forward(nn_params, st.pgm_nat, prior, x,
                                       jax.random.PRNGKey(0), config, eps=e)
                return -out.elbo / config.num_total, out
            (loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.nn_params)
            updates, opt_state = opt.update(grads, st.opt_state,
                                            st.nn_params)
            nn_params = optax.apply_updates(st.nn_params, updates)
            inc = gmm.stats_to_nat(out.suff_stats)
            pgm_nat = natgrad.cvi_update(st.pgm_nat, prior, inc, rho)
            return svae_step.SvaeTrainState(
                nn_params=nn_params, opt_state=opt_state, pgm_nat=pgm_nat,
                step=st.step + 1), (out.recon, out.local_kl)

        st_o = state
        mets_o = []
        step_j = jax.jit(one_step)
        for t in range(t_par):
            st_o, m = step_j(st_o, eps[t])
            mets_o.append(m)
        jax.block_until_ready(st_o.pgm_nat.dir_nat)

        worst = 0.0
        for la, lb in zip(jax.tree.leaves(st_k.nn_params),
                          jax.tree.leaves(st_o.nn_params)):
            d = float(jnp.max(jnp.abs(la - lb)))
            worst = max(worst, d)
        nat_rel = max(
            float(jnp.max(jnp.abs(la - lb) / (jnp.abs(lb) + 1e-6)))
            for la, lb in zip(jax.tree.leaves(st_k.pgm_nat),
                              jax.tree.leaves(st_o.pgm_nat)))
        rec_k = float(mets_k["recon"][-1])
        rec_o = float(mets_o[-1][0])
        print(f"[parity] nn max|Δ|={worst:.2e}  nat max rel Δ={nat_rel:.2e}"
              f"  recon kernel={rec_k:.4f} oracle={rec_o:.4f}")
        # Thresholds: measured hardware f32 noise after 3 compounding steps
        # is nn ~2e-5 / naturals ~9e-4 rel (softmax amplification); an
        # order-of-magnitude margin still catches real bugs (the pre-fix
        # default-precision MXU run failed at 3e-3 / 6e-2).
        assert worst < 2e-4, "HW parity failure on nn params"
        assert nat_rel < 3e-3, "HW parity failure on naturals"
        assert abs(rec_k - rec_o) / (abs(rec_o) + 1e-6) < 5e-3

    # ------------------------------------------------ throughput (PRNG mode)
    prec = (jax.lax.Precision.HIGHEST if args.precision == "highest"
            else jax.lax.Precision.DEFAULT)
    t_steps = args.t_steps
    t0 = time.perf_counter()
    st, mets = tsp.train_chunk(state, prior, x, lr=lr, rho=rho,
                               t_steps=t_steps, num_samples=s, seed=1,
                               precision=prec, aug_noise=args.aug_noise)
    float(st.pgm_nat.dir_nat[0])  # host-read sync: block_until_ready can
    #                               return early through the remote tunnel
    print(f"[tput] compile+first chunk: {time.perf_counter()-t0:.1f}s  "
          f"neg_loss[0]={float(mets['neg_loss'][0]):.4f} "
          f"neg_loss[-1]={float(mets['neg_loss'][-1]):.4f}")

    times = []
    for i in range(args.chunks):
        t0 = time.perf_counter()
        st, mets = tsp.train_chunk(st, prior, x, lr=lr, rho=rho,
                                   t_steps=t_steps, num_samples=s,
                                   seed=2 + i, precision=prec,
                                   aug_noise=args.aug_noise)
        float(st.pgm_nat.dir_nat[0])  # host-read sync (see above)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    sps = t_steps / dt
    nl = float(mets["neg_loss"][-1])
    assert nl == nl, "NaN in megakernel training"
    print(json.dumps({
        "metric": "tinystep_megakernel_steps_per_sec",
        "precision": args.precision,
        "aug_noise": args.aug_noise,
        "value": round(sps, 1),
        "us_per_step": round(1e6 * dt / t_steps, 2),
        "t_steps_per_launch": t_steps,
        "final_neg_loss": round(nl, 4),
        "times": [round(t, 4) for t in times],
    }))


if __name__ == "__main__":
    main()
