#!/usr/bin/env python
"""Flexstep megakernel on real TPU: hardware parity + auto-config throughput.

Mirrors benchmarks/bench_tinystep.py for the generalized small-d
minibatch kernel at BASELINE config #3 (auto-svae: d_in=8, latent 4,
K=10, S=4, batch 64, MLPs 100-100, rho 0.2 decaying):

  1. parity — a few steps with INJECTED eps + a fixed batch stack through
     (a) the Mosaic-compiled flexstep kernel and (b) the XLA train step;
  2. throughput — in-kernel PRNG, T steps per launch, paired-chunk
     marginal timing, printed next to the XLA scan number (8698 steps/s
     wall in round 2 at the tuned chunk).

Usage: python benchmarks/bench_flexstep.py [--t-steps 2000] [--skip-parity]
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
    ap.add_argument("--precision", choices=["highest", "default"],
                    default="highest")
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

    from svax.data import load_dataset
    from svax.models.svae import SvaeConfig
    from svax.ops import flexstep_pallas as fsp
    from svax.pgm import gmm
    from svax.train import svae_step

    train, _, meta = load_dataset("auto", seed=0)
    x = jnp.asarray(train, dtype=jnp.float32)
    n, d_in = x.shape
    k, d, s, m, lr, rho0, decay = 10, 4, 4, 64, 1e-3, 0.2, 0.001
    hidden = (100, 100)
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=s,
                        num_total=n)
    prior = jax.tree.map(lambda a: a.astype(jnp.float32),
                         gmm.make_prior(k, d, kappa=0.05))
    opt = optax.adam(lr)
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(key, d_in, config, prior, opt, hidden,
                                 hidden, data=x)
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state)

    if not args.skip_parity:
        t_par = 3
        rng = np.random.default_rng(7)
        idx = rng.integers(0, n, size=(t_par, m))
        batches = x[jnp.asarray(idx)]
        eps = jnp.asarray(
            rng.standard_normal((t_par, s, m, k, d)).astype(np.float32))
        t0 = time.perf_counter()
        st_k, mets_k = fsp.train_chunk(state, prior, batches, lr=lr,
                                       rho=rho0, rho_decay=decay,
                                       num_total=n, eps=eps)
        jax.block_until_ready(st_k.pgm_nat.dir_nat)
        print(f"[parity] kernel compile+run: {time.perf_counter()-t0:.1f}s")

        from svax.models import svae as svae_mod
        from svax.pgm import natgrad

        def one_step(st, xb, e, rho_t):
            def loss_fn(nn_params):
                out = svae_mod.forward(nn_params, st.pgm_nat, prior, xb,
                                       jax.random.PRNGKey(0), config, eps=e)
                return -(out.recon - out.local_kl) / config.num_total, out
            (loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.nn_params)
            updates, opt_state = opt.update(grads, st.opt_state,
                                            st.nn_params)
            nn_params = optax.apply_updates(st.nn_params, updates)
            inc = gmm.stats_to_nat(out.suff_stats)
            pgm_nat = natgrad.cvi_update(st.pgm_nat, prior, inc, rho_t)
            return svae_step.SvaeTrainState(
                nn_params=nn_params, opt_state=opt_state, pgm_nat=pgm_nat,
                step=st.step + 1), out.recon

        st_o = state
        step_j = jax.jit(one_step)
        for t in range(t_par):
            st_o, rec_o = step_j(st_o, batches[t], eps[t],
                                 rho0 / (1.0 + decay * t))
        jax.block_until_ready(st_o.pgm_nat.dir_nat)

        worst = max(
            float(jnp.max(jnp.abs(la - lb)))
            for la, lb in zip(jax.tree.leaves(st_k.nn_params),
                              jax.tree.leaves(st_o.nn_params)))
        # Leaf-scale relative error: per-entry rel on naturals is noise-
        # dominated at near-zero entries (measured: |Δ|=6.7e-4 on an η₁
        # entry of 0.025 inside a leaf of norm 15 — 4e-5 at leaf scale).
        nat_rel = max(
            float(jnp.max(jnp.abs(la - lb)) / (jnp.max(jnp.abs(lb)) + 1e-6))
            for la, lb in zip(jax.tree.leaves(st_k.pgm_nat),
                              jax.tree.leaves(st_o.pgm_nat)))
        rec_k = float(mets_k["recon"][-1])
        print(f"[parity] nn max|Δ|={worst:.2e}  nat max rel Δ={nat_rel:.2e}"
              f"  recon kernel={rec_k:.4f} oracle={float(rec_o):.4f}")
        assert worst < 2e-4, "HW parity failure on nn params"
        assert nat_rel < 3e-3, "HW parity failure on naturals"
        assert abs(rec_k - float(rec_o)) / (abs(float(rec_o)) + 1e-6) < 5e-3

    # ------------------------------------------------ throughput (PRNG mode)
    prec = (jax.lax.Precision.HIGHEST if args.precision == "highest"
            else jax.lax.Precision.DEFAULT)
    t1 = args.t_steps
    kb = jax.random.PRNGKey(1)

    def run(st, t_steps, i):
        kbi = jax.random.fold_in(kb, i)
        idx = jax.random.randint(kbi, (t_steps, m), 0, n)
        batches = x[idx]
        t0 = time.perf_counter()
        st, mets = fsp.train_chunk(st, prior, batches, lr=lr, rho=rho0,
                                   rho_decay=decay, num_total=n,
                                   num_samples=s, seed=2 + i,
                                   precision=prec)
        float(st.pgm_nat.dir_nat[0])  # host-read sync through the tunnel
        return st, mets, time.perf_counter() - t0

    st, mets, _ = run(state, t1, 0)       # compile T and 2T variants
    st, mets, _ = run(st, 2 * t1, 1)
    marginals, singles = [], []
    for i in range(args.reps):
        st, mets, dt1 = run(st, t1, 10 + 2 * i)
        st, mets, dt2 = run(st, 2 * t1, 11 + 2 * i)
        marginals.append((dt2 - dt1) / t1)
        singles.append(dt1 / t1)
    mar = statistics.median(marginals)
    nl = float(mets["neg_loss"][-1])
    assert nl == nl, "NaN in flexstep training"
    print(json.dumps({
        "metric": "flexstep_megakernel_auto_steps_per_sec",
        "precision": args.precision,
        "value": round(1.0 / mar, 1),
        "us_per_step_marginal": round(1e6 * mar, 2),
        "us_per_step_wall_T": round(1e6 * statistics.median(singles), 2),
        "t_steps_per_launch": t1,
        "final_neg_loss": round(nl, 4),
        "synthetic_data": bool(meta.get("synthetic", False)),
    }))


if __name__ == "__main__":
    main()
