#!/usr/bin/env python
"""Quality pins for the Bernoulli/high-d configs (VERDICT r3 item 3).

mnist-svae and bigk-dp were throughput-only rows: no cluster purity,
test ELBO, or IW number was pinned, so a kernel-stack regression that
degraded quality on the Bernoulli path would pass every gate. This
script trains both configs with their PINNED kernel defaults
(fused_combine / fused_mlp_decoder / bf16 decoder / kernel_rng, exactly
the configs/ rows) and scores each on the held-out split:

  * test ELBO per point (svae_step.make_eval_fn),
  * IW log-likelihood per point (evaluation.svae_iw_loglik),
  * cluster purity of the hard SIN-posterior assignment vs labels
    (evaluation.cluster_purity; SURVEY §3a Evaluation row).

Writes runs/mnist_quality.json (surrogate-flagged — see docs/DATA.md for
the real-file drop-in protocol). A reduced-scale CPU regression pin
lives in tests/test_mnist_quality_pin.py.

Usage: python experiments/mnist_quality.py [--quick] [--configs mnist-svae bigk-dp]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_config(name: str, quick: bool, iw_samples: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from configs import CONFIGS
    from svax.data import load_mnist
    from svax.models import evaluation, svae as svae_mod
    from svax.models.svae import SvaeConfig
    from svax.nets import mlp as nets
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_minibatch_scan_runner
    from svax.train.warmup import vae_warmup_reseed

    cfg = CONFIGS[name]
    x_train, x_test, meta, y_train, y_test = load_mnist(
        seed=0, return_labels=True
    )
    x = jnp.asarray(x_train, jnp.float32)
    xt = jnp.asarray(x_test, jnp.float32)
    n = x.shape[0]
    steps = 400 if quick else cfg["steps"]
    batch = cfg["batch_size"]
    chunk = min(cfg.get("scan_chunk", 100), steps)

    config = SvaeConfig(
        latent_dim=cfg["latent_dim"],
        num_components=cfg["num_components"],
        num_samples=cfg["num_samples"],
        likelihood="bernoulli",
        num_total=n,
        nn_compute_dtype=cfg.get("nn_compute_dtype", "float32"),
        fused_combine=cfg.get("fused_combine", False),
        fused_mlp_decoder=cfg.get("fused_mlp_decoder", False),
        kernel_rng=cfg.get("kernel_rng", False),
    )
    prior = gmm.make_prior(
        config.num_components, config.latent_dim,
        alpha=cfg.get("alpha", 1.0), kappa=cfg.get("kappa", 0.05),
    )
    opt = optax.adam(cfg["lr"])
    rho0, decay = cfg["rho"], cfg.get("rho_decay", 0.0)
    rho = rho0 if decay == 0.0 else (
        lambda t: rho0 / (1.0 + decay * t.astype(jnp.float32)))
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(
        key, x.shape[1], config, prior, opt,
        tuple(cfg["encoder_hidden"]), tuple(cfg["decoder_hidden"]), data=x,
    )
    step = svae_step.make_train_step(config, prior, opt, rho=rho)
    runner = make_minibatch_scan_runner(step, chunk)

    t0 = time.perf_counter()
    warmup = cfg.get("warmup_steps", 0)
    if quick:
        warmup = min(warmup, 400)
    if warmup:
        state, winfo = vae_warmup_reseed(
            state, x, config, prior, opt, jax.random.fold_in(key, 17),
            steps=warmup, batch_size=batch, scan_chunk=chunk,
        )
        print(f"[{name}] warmup {warmup} steps, reseed occupancy "
              f"{winfo['seed_occupancy']}", flush=True)
    kk = key
    for c in range(steps // chunk):
        kk = jax.random.fold_in(kk, c)
        kb, kr = jax.random.split(kk)
        idx = jax.random.randint(kb, (chunk, batch), 0, n)
        state, mets = runner(state, x[idx], kr)
    jax.block_until_ready(state.pgm_nat.dir_nat)
    wall = time.perf_counter() - t0

    # Eval kernels gate off the fused paths automatically off-shape; use a
    # plain eval config so the scores are engine-independent.
    eval_config = config._replace(
        fused_combine=False, fused_mlp_decoder=False, kernel_rng=False,
        nn_compute_dtype="float32",
    )
    ev = jax.jit(svae_step.make_eval_fn(eval_config, prior))(
        state, xt, jax.random.PRNGKey(99)
    )
    iw = jax.jit(
        lambda nn, nat, k: jnp.mean(evaluation.svae_iw_loglik(
            nn, nat, xt, k, eval_config, num_samples=iw_samples))
    )(state.nn_params, state.pgm_nat, jax.random.PRNGKey(999))

    row = {
        "steps": steps,
        "train_wall_s": round(wall, 1),
        "final_train_elbo_per_point": round(
            float(mets["elbo"][-1]) / n, 4),
        "test_elbo_per_point": round(float(ev["elbo_per_point"]), 4),
        "test_iw_per_point": round(float(iw), 4),
        "iw_samples": iw_samples,
        "synthetic_data": bool(meta.get("synthetic", False)),
    }
    if y_test is not None:
        exp = gmm.expected_params(state.pgm_nat)
        pot_h, pot_p = nets.encoder_apply(state.nn_params["encoder"], xt)
        post = svae_mod.sin_combine(pot_h, pot_p, exp)
        resp = jnp.exp(post.log_resp)
        row["test_cluster_purity"] = round(
            float(evaluation.cluster_purity(resp, np.asarray(y_test))), 4)
        row["components_used"] = int(
            np.unique(np.asarray(jnp.argmax(post.log_resp, -1))).size)
    else:
        row["test_cluster_purity"] = None
    return row


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", nargs="+",
                    default=["mnist-svae", "bigk-dp"])
    ap.add_argument("--iw-samples", type=int, default=100)
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    out = {}
    for name in args.configs:
        out[name] = run_config(name, args.quick,
                               args.iw_samples if not args.quick else 20)
        print(f"[{name}] {json.dumps(out[name])}", flush=True)
    Path("runs").mkdir(exist_ok=True)
    Path("runs/mnist_quality.json").write_text(json.dumps(out, indent=1))
    print("wrote runs/mnist_quality.json")


if __name__ == "__main__":
    main()
