#!/usr/bin/env python
"""Pinwheel SVAE seed-robustness sweep (VERDICT r2 item 2).

Round 2 reported final IW/point of −5.38, −5.90, −6.81, −6.57 on seeds
0–3 — the "structured prior crosses the pure-GMM predictive (−5.41)"
claim held on 1/4 seeds. This harness trains ≥8 seeds per variant on TPU
(each 15k-step run is ~7 s once compiled; the step function is shared
across seeds) and reports mean ± sd + crossing counts, exploring the
mechanisms the VERDICT names:

  base        round-2 default: ρ=0.05 constant, random-data-point init
  kpp         k-means++ PGM init (svax/pgm/init.py) — latent d == input d
              on pinwheel, so data-space seeds are valid latent seeds
  warmup      CVI ρ ramps 1e-3 → 0.05 over the first 3000 steps: the EMA
              time constant 1/ρ is ~20 steps at 0.05, so the mixture
              otherwise commits to the random encoder's latent layout in
              the first dozens of steps and arms merge irrecoverably
  kpp+warmup  both

Usage:
  python experiments/seed_sweep.py --variants base kpp warmup kpp+warmup \
      --num-seeds 8 [--steps 15000] [--json runs/seed_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Pure-GMM exact Student-t predictive on the same split (BASELINE.md).
GMM_PREDICTIVE_BAR = -5.41


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+",
                    default=["base", "kpp", "warmup", "kpp+warmup"])
    ap.add_argument("--num-seeds", type=int, default=8)
    ap.add_argument("--seed-list", type=int, nargs="+", default=None,
                    help="explicit seeds to run (overrides --num-seeds); "
                         "e.g. the redraw table's below-bar draws 4 6")
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--iw-samples", type=int, default=1000)
    ap.add_argument("--warmup-steps", type=int, default=3000)
    ap.add_argument("--warmup-floor", type=float, default=1e-3)
    ap.add_argument("--rho", type=float, default=0.05)
    ap.add_argument("--json", type=str, default="")
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default")
    ap.add_argument("--engine", choices=["xla", "mega"], default="xla",
                    help="'mega' runs every variant through the megakernel "
                         "engine (make_megakernel_runner: tinystep for "
                         "aug=0, flexstep via the pre-augmented batch "
                         "stack for aug>0) — the VERDICT r3 headline-"
                         "unification sweep. warmup/wd variants are "
                         "outside the kernels' scope and rejected loudly")
    ap.add_argument("--nn-precision", choices=["high", "highest", "default"],
                    default="high",
                    help="SvaeConfig.nn_precision; under --engine mega "
                         "'high' maps to HIGHEST kernel dots (Mosaic has "
                         "no bf16x3) and 'default' to 1-pass bf16")
    ap.add_argument("--encoder-head", choices=["diag", "full"],
                    default="diag",
                    help="recognition-potential family (SvaeConfig."
                         "encoder_head); 'full' forces --engine xla")
    ap.add_argument("--redraw-data", action="store_true",
                    help="redraw the pinwheel per seed (round-2 protocol) "
                         "and compute the per-draw pure-GMM exact "
                         "predictive as the crossing bar")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    import optax

    from svax.data import load_pinwheel
    from svax.models import evaluation
    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm
    from svax.pgm.init import init_variational_kmeanspp
    from svax.train import svae_step
    from svax.train.loop import augment_step, make_scan_runner

    def draw(seed):
        train, test = load_pinwheel(seed=seed)
        return (train, jnp.asarray(train, jnp.float32),
                jnp.asarray(test, jnp.float32))

    train, x, xt = draw(0)
    n = x.shape[0]
    k, s, lr = 10, 4, 1e-3
    prec = {"high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[args.nn_precision]
    config = SvaeConfig(latent_dim=2, num_components=k, num_samples=s,
                        num_total=n, nn_precision=prec,
                        encoder_head=args.encoder_head)
    prior = gmm.make_prior(k, 2, kappa=0.05)
    opt = optax.adam(lr)

    def make_rho(warm: bool):
        if not warm:
            return args.rho
        lo, hi, t_ramp = args.warmup_floor, args.rho, args.warmup_steps

        def rho_fn(step):
            frac = jnp.minimum(step.astype(jnp.float32) / t_ramp, 1.0)
            return lo + (hi - lo) * frac

        return rho_fn

    iw_eval = jax.jit(
        lambda nn, nat, xtest, key: jnp.mean(evaluation.svae_iw_loglik(
            nn, nat, xtest, key, config, num_samples=args.iw_samples))
    )

    def gmm_bar(train_np, xtest):
        """Pure-GMM exact Student-t predictive on this draw (the bar)."""
        from svax.models import gmm_baseline

        st = gmm_baseline.init_state(jax.random.PRNGKey(0), prior,
                                     jnp.asarray(train_np, jnp.float32))
        step_g = jax.jit(gmm_baseline.make_train_step(
            prior, 1.0, len(train_np)))
        for _ in range(300):
            st, _m = step_g(st, jnp.asarray(train_np, jnp.float32))
        pred = evaluation.gmm_predictive_log_prob(st.nat, xtest)
        return float(pred.mean())
    from svax.train import svae_step as svae_step_mod  # noqa: F401

    def make_test_elbo():
        from svax.models import svae as svae_m

        def f(nn, nat, xtest, key):
            out = svae_m.forward(nn, nat, prior, xtest, key,
                                 config._replace(num_total=xt.shape[0]))
            return out.elbo / xtest.shape[0]

        return jax.jit(f)

    test_elbo_eval = make_test_elbo()

    results = {}
    for variant in args.variants:
        # Variant spec: '+'-joined tokens — base | kpp | warmup |
        # wd<float> (adamw weight decay) | steps<int> |
        # aug<float> (input-noise augmentation sigma).
        tokens = variant.split("+")
        use_kpp = "kpp" in tokens
        use_warm = "warmup" in tokens
        wd = next((float(t[2:]) for t in tokens if t.startswith("wd")), 0.0)
        v_steps = next((int(t[5:]) for t in tokens if t.startswith("steps")),
                       args.steps)
        aug = next((float(t[3:]) for t in tokens if t.startswith("aug")), 0.0)
        restarts = next((int(t[2:]) for t in tokens if t.startswith("rs")), 1)
        v_opt = optax.adamw(lr, weight_decay=wd) if wd > 0.0 else opt
        base_step = svae_step.make_train_step(config, prior, v_opt,
                                              rho=make_rho(use_warm))
        step = augment_step(base_step, aug)
        # Clamp the scan chunk to the variant's step budget (a steps500
        # variant under the default --chunk 1000 would otherwise run ZERO
        # chunks and hit `metrics` unbound) and refuse silent truncation.
        v_chunk = min(args.chunk, v_steps)
        if v_steps % v_chunk:
            raise SystemExit(
                f"variant {variant!r}: steps {v_steps} is not a multiple "
                f"of chunk {v_chunk} — the remainder would be dropped"
            )
        mega_runner = None
        if args.engine == "mega":
            if use_warm or wd > 0.0:
                raise SystemExit(
                    f"variant {variant!r}: --engine mega supports constant "
                    "or inverse-decay rho and plain Adam only (no warmup "
                    "ramp, no weight decay) — run these on --engine xla"
                )
            from svax.train.loop import make_megakernel_runner

            mega_runner = make_megakernel_runner(
                config, prior, lr=lr, rho=args.rho, batch_size=0,
                aug_noise=aug, encoder_hidden=(50, 50),
                decoder_hidden=(50, 50))
        runner = make_scan_runner(step, v_chunk)
        rows = []
        seeds = (args.seed_list if args.seed_list is not None
                 else range(args.num_seeds))
        for seed in seeds:
            if args.redraw_data:
                train, x, xt = draw(seed)
            bar = (gmm_bar(train, xt) if args.redraw_data
                   else GMM_PREDICTIVE_BAR)
            t0 = time.perf_counter()
            best = None  # (train elbo, state, metrics) — restart selection
            for r in range(restarts):
                key = jax.random.PRNGKey(seed + 1000 * r)
                state = svae_step.init_state(key, 2, config, prior, v_opt,
                                             (50, 50), (50, 50), data=x)
                if use_kpp:
                    state = state._replace(pgm_nat=init_variational_kmeanspp(
                        prior, np.asarray(train), seed=seed + 1000 * r))
                kk = key
                for c in range(v_steps // v_chunk):
                    kk = jax.random.fold_in(kk, c)
                    if mega_runner is not None:
                        state, metrics = mega_runner(
                            state, x, v_chunk, seed=seed + 1000 * r)
                    else:
                        state, metrics = runner(state, x, kk)
                # Restart selection by TRAIN-side ELBO only (no test leak).
                tr_elbo = float(metrics["elbo"][-1])
                if best is None or tr_elbo > best[0]:
                    best = (tr_elbo, state, metrics)
            _, state, metrics = best
            jax.block_until_ready(state.pgm_nat.dir_nat)
            wall = time.perf_counter() - t0
            iw = float(iw_eval(state.nn_params, state.pgm_nat, xt,
                               jax.random.PRNGKey(seed + 999)))
            elbo = float(metrics["elbo"][-1]) / n
            te = float(test_elbo_eval(state.nn_params, state.pgm_nat, xt,
                                      jax.random.PRNGKey(seed + 1999)))
            rows.append({"seed": seed, "iw_per_point": round(iw, 3),
                         "final_elbo_per_point": round(elbo, 3),
                         "test_elbo_per_point": round(te, 3),
                         "gmm_bar": round(bar, 3),
                         "crossed": bool(iw > bar),
                         "wall_s": round(wall, 1)})
            print(f"[{variant}] seed {seed}: IW/pt {iw:.3f}  "
                  f"ELBO/pt {elbo:.3f}  testELBO/pt {te:.3f}  "
                  f"bar {bar:.3f} {'CROSS' if iw > bar else 'below'}  "
                  f"({wall:.1f}s)", flush=True)
        iws = np.asarray([r["iw_per_point"] for r in rows])
        crossing = int(np.sum([r["crossed"] for r in rows]))
        summary = {
            "mean": round(float(iws.mean()), 3),
            "sd": round(float(iws.std(ddof=1)), 3),
            "min": round(float(iws.min()), 3),
            "max": round(float(iws.max()), 3),
            "crossing": f"{crossing}/{len(iws)}",
            "bar": ("per-draw gmm predictive" if args.redraw_data
                    else GMM_PREDICTIVE_BAR),
        }
        results[variant] = {"rows": rows, "summary": summary}
        print(f"== {variant}: mean {summary['mean']} ± {summary['sd']}  "
              f"crossing {summary['crossing']}", flush=True)

    if args.json:
        Path(args.json).write_text(json.dumps(
            {"config": vars(args), "results": results}, indent=1))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
