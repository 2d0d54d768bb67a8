#!/usr/bin/env python
"""Measure the quality of the serving ``impute`` endpoint (VERDICT r4 #4).

The round-4 missing-data endpoint (svax/serve.py::SvaeServer.impute,
iterated encode → posterior-mean decode) shipped with mechanics tests but
no accuracy number. This experiment attaches one, against the two honest
baselines a user would actually compare with:

  * **mean-fill** — fill missing features with the train-set feature means
    (the zero-model baseline);
  * **VAE impute** — the same fixed-point iteration through a plain VAE
    trained at the MATCHED budget (same nets, steps, batch, lr), isolating
    the value of the structured mixture posterior.

Protocols:
  * **pinwheel** (Gaussian, d=2): hide one coordinate per test point, both
    patterns (x-hidden, y-hidden). Metrics: RMSE over hidden coordinates,
    and the held-out Gaussian NLL of the true hidden value under each
    model's decoder head evaluated at the imputation fixed point
    (mean-fill's NLL uses the train-marginal Gaussian per feature).
  * **mnist surrogate** (Bernoulli, 784-d): random 50% pixel mask per test
    point (fixed key). Metrics: masked-pixel Bernoulli NLL under the final
    decoder probabilities, and masked-pixel 0/1 error at threshold 0.5
    (mean-fill uses the train pixel means as probabilities). Surrogate
    data — flagged in the artifact, same caveat as every MNIST number
    (docs/DATA.md).

Both the live (jit) and AOT (StableHLO export) serving tiers are measured
for the SVAE; they must agree to float tolerance (the export bakes the
same weights).

Writes runs/impute_quality.json.

Usage:
  python experiments/impute_demo.py                 # full settings, TPU
  python experiments/impute_demo.py --quick --platform cpu
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--impute-iters", type=int, default=10)
    ap.add_argument("--json", default="runs/impute_quality.json")
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
    import jax.numpy as jnp
    import numpy as np
    import optax

    from svax import serve
    from svax.data import load_dataset
    from svax.models import vae as vae_mod
    from svax.nets import mlp as nets
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import (
        augment_step,
        make_megakernel_runner,
        make_minibatch_scan_runner,
        make_scan_runner,
        megakernel_unsupported_reason,
    )
    from svax.train.warmup import vae_warmup_reseed

    specs = {
        "pinwheel": dict(steps=15000, batch=0, d=2, s=4, hidden=(50, 50),
                         rho=0.05, aug=0.4, warmup=0),
        "mnist": dict(steps=5000, batch=256, d=8, s=1, hidden=(200, 200),
                      rho=0.1, aug=0.0, warmup=1000),
    }
    k, lr = 10, 1e-3
    out = {}
    for ds, sp in specs.items():
        if args.quick:
            sp = dict(sp, steps=500, warmup=min(sp["warmup"], 100))
        train, test, meta = load_dataset(ds, seed=0)
        x = jnp.asarray(train, jnp.float32)
        xt = jnp.asarray(test, jnp.float32)
        n, d_in = x.shape
        batch = sp["batch"] or n
        from svax.models.svae import SvaeConfig

        config = SvaeConfig(latent_dim=sp["d"], num_components=k,
                            num_samples=sp["s"],
                            likelihood=meta["likelihood"], num_total=n)
        vconfig = vae_mod.VaeConfig(latent_dim=sp["d"],
                                    num_samples=sp["s"],
                                    likelihood=meta["likelihood"])
        prior = gmm.make_prior(k, sp["d"], alpha=1.0, kappa=0.05)
        opt = optax.adam(lr)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()

        # ---------------- SVAE at the shipped recipe ------------------
        st = svae_step.init_state(key, d_in, config, prior, opt,
                                  sp["hidden"], sp["hidden"], data=x)
        if sp["warmup"]:
            st, _w = vae_warmup_reseed(
                st, x, config, prior, opt, jax.random.fold_in(key, 17),
                steps=sp["warmup"], batch_size=sp["batch"], scan_chunk=500,
            )
        reason = megakernel_unsupported_reason(
            config, batch_full=sp["batch"] == 0,
            encoder_hidden=sp["hidden"], decoder_hidden=sp["hidden"],
            rho=sp["rho"], aug_noise=sp["aug"], input_dim=d_in)
        if reason is None and jax.devices()[0].platform == "tpu":
            runner = make_megakernel_runner(
                config, prior, lr=lr, rho=sp["rho"], batch_size=sp["batch"],
                aug_noise=sp["aug"], encoder_hidden=sp["hidden"],
                decoder_hidden=sp["hidden"])
            st, _ = runner(st, x, sp["steps"], seed=0)
            engine = "mega"
        else:
            base = augment_step(
                svae_step.make_train_step(config, prior, opt, rho=sp["rho"]),
                sp["aug"])
            if batch < n:
                runner = make_minibatch_scan_runner(base, sp["steps"])
                kb, kr = jax.random.split(key)
                idx = jax.random.randint(kb, (sp["steps"], batch), 0, n)
                st, _ = runner(st, x[idx], kr)
            else:
                runner = make_scan_runner(base, sp["steps"])
                st, _ = runner(st, x, key)
            engine = "xla"
        svae_train_s = time.perf_counter() - t0

        # ---------------- VAE at the matched budget -------------------
        t0 = time.perf_counter()
        vst = vae_mod.init_state(key, d_in, vconfig, opt,
                                 sp["hidden"], sp["hidden"])
        vbase = augment_step(vae_mod.make_train_step(vconfig, opt), sp["aug"])
        if batch < n:
            vrunner = make_minibatch_scan_runner(vbase, sp["steps"])
            kb, kr = jax.random.split(jax.random.fold_in(key, 1))
            idx = jax.random.randint(kb, (sp["steps"], batch), 0, n)
            vst, _ = vrunner(vst, x[idx], kr)
        else:
            vrunner = make_scan_runner(vbase, sp["steps"])
            vst, _ = vrunner(vst, x, jax.random.fold_in(key, 1))
        vae_train_s = time.perf_counter() - t0

        # ---------------- masks + ground truth ------------------------
        xt_np = np.asarray(xt)
        if ds == "pinwheel":
            # Hide each coordinate in turn: 2·N problems.
            x_true = np.concatenate([xt_np, xt_np])
            mask = np.ones_like(x_true)
            mask[: len(xt_np), 0] = 0.0
            mask[len(xt_np):, 1] = 0.0
        else:
            rng = np.random.default_rng(0)
            x_true = xt_np
            mask = (rng.uniform(size=x_true.shape) > 0.5).astype(np.float32)
        hidden = mask == 0.0
        x_masked = np.where(hidden, np.nan, x_true).astype(np.float32)

        # ---------------- the four fills ------------------------------
        server = serve.SvaeServer(
            st.nn_params, st.pgm_nat,
            serve.ModelSpec(
                input_dim=d_in, latent_dim=sp["d"], num_components=k,
                likelihood=meta["likelihood"], encoder_hidden=sp["hidden"],
                decoder_hidden=sp["hidden"], num_samples=sp["s"],
                num_total=n),
            buckets=(1024, 4096) if ds == "pinwheel" else (1024,),
        )
        fill_live = server.impute(x_masked, mask,
                                  num_iters=args.impute_iters)
        # mode="map" decodes the MAP component instead of the mixture
        # mean — the decision rule for multimodal conditionals (round-5
        # finding: mode-averaging on pinwheel lands between spiral arms).
        fill_map = server.impute(x_masked, mask,
                                 num_iters=args.impute_iters, mode="map")
        with tempfile.TemporaryDirectory() as tmp:
            serve.export_serving(server, tmp, score_samples=5,
                                 impute_iters=args.impute_iters)
            fill_aot = serve.load_exported(tmp).impute(x_masked, mask)
        with tempfile.TemporaryDirectory() as tmp:
            serve.export_serving(server, tmp, score_samples=5,
                                 impute_iters=args.impute_iters,
                                 impute_mode="map")
            fill_aot_map = serve.load_exported(tmp).impute(x_masked, mask)

        act = vconfig.activation

        @jax.jit
        def vae_recon(xc):
            pot_h, pot_p = nets.encoder_apply(vst.params["encoder"], xc, act)
            z = pot_h / pot_p  # posterior mean of the diagonal Gaussian
            out = nets.decoder_apply(vst.params["decoder"], z,
                                     vconfig.likelihood, act)
            if vconfig.likelihood == "gaussian":
                return out[0]
            return jax.nn.sigmoid(out)

        xv = jnp.asarray(np.where(hidden, 0.0, x_true), jnp.float32)
        mj = jnp.asarray(mask)
        cur = xv
        for _ in range(args.impute_iters):
            cur = mj * xv + (1.0 - mj) * vae_recon(cur)
        fill_vae = np.asarray(cur)

        feat_mean = np.asarray(x).mean(0)
        fill_mean = np.where(hidden, feat_mean[None, :], x_true)

        # ---------------- metrics -------------------------------------
        def rmse(fill):
            return float(np.sqrt(np.mean((fill[hidden] - x_true[hidden]) ** 2)))

        row = {
            "protocol": ("hide-one-coordinate (both patterns)"
                         if ds == "pinwheel" else "random 50% pixel mask"),
            "n_problems": int(x_true.shape[0]),
            "hidden_frac": round(float(hidden.mean()), 3),
            "impute_iters": args.impute_iters,
            "budget": {"steps": sp["steps"], "batch": sp["batch"],
                       "hidden": list(sp["hidden"]), "lr": lr, "k": k,
                       "d": sp["d"], "rho": sp["rho"], "aug": sp["aug"],
                       "warmup": sp["warmup"], "svae_engine": engine},
            "train_wall_s": {"svae": round(svae_train_s, 1),
                             "vae": round(vae_train_s, 1)},
            "synthetic_data": bool(meta.get("synthetic", False)),
        }
        if ds == "pinwheel":
            # Held-out NLL of the truth under each model's predictive for
            # the hidden coordinate at the imputation fixed point.
            def decoder_nll(fill, params, like_act):
                pot_h, pot_p = nets.encoder_apply(
                    params["encoder"], jnp.asarray(fill), like_act)
                if params is st.nn_params:
                    from svax.models import svae as svae_m

                    post = svae_m.sin_combine(
                        pot_h, pot_p, gmm.expected_params(st.pgm_nat))
                    resp = jnp.exp(post.log_resp)
                    z = jnp.einsum("nk,nkd->nd", resp, post.mean)
                else:
                    z = pot_h / pot_p
                mean, var = nets.decoder_apply(
                    params["decoder"], z, "gaussian", like_act)
                nll = 0.5 * ((jnp.asarray(x_true) - mean) ** 2 / var
                             + jnp.log(var) + jnp.log(2 * jnp.pi))
                return float(jnp.mean(nll[jnp.asarray(hidden)]))

            mu, sd2 = feat_mean, np.asarray(x).var(0)
            nll_mean = float(np.mean(
                (0.5 * ((x_true - mu[None]) ** 2 / sd2[None]
                        + np.log(sd2[None]) + np.log(2 * np.pi)))[hidden]))
            row["rmse"] = {
                "svae_live": round(rmse(fill_live), 4),
                "svae_map": round(rmse(fill_map), 4),
                "svae_aot": round(rmse(fill_aot), 4),
                "svae_aot_map": round(rmse(fill_aot_map), 4),
                "vae": round(rmse(fill_vae), 4),
                "mean_fill": round(rmse(fill_mean), 4),
            }
            row["hidden_coord_nll"] = {
                "svae": round(decoder_nll(fill_live, st.nn_params,
                                          config.activation), 4),
                "svae_map": round(decoder_nll(fill_map, st.nn_params,
                                              config.activation), 4),
                "vae": round(decoder_nll(fill_vae, vst.params, act), 4),
                "mean_fill_marginal": round(nll_mean, 4),
            }
        else:
            # Bernoulli: the decoder PROBABILITIES at the fixed point are
            # the predictive for hidden pixels — fill_* already holds them.
            def bern_nll(p):
                p = np.clip(p, 1e-6, 1 - 1e-6)
                ll = x_true * np.log(p) + (1 - x_true) * np.log1p(-p)
                return float(-ll[hidden].mean())

            def bit_err(p):
                return float(np.mean((p[hidden] > 0.5) != (x_true[hidden] > 0.5)))

            p_mean = np.broadcast_to(
                np.clip(feat_mean, 1e-6, 1 - 1e-6), x_true.shape)
            row["masked_pixel_nll"] = {
                "svae_live": round(bern_nll(fill_live), 4),
                "svae_map": round(bern_nll(fill_map), 4),
                "svae_aot": round(bern_nll(fill_aot), 4),
                "vae": round(bern_nll(fill_vae), 4),
                "mean_fill": round(bern_nll(p_mean), 4),
            }
            row["masked_pixel_err"] = {
                "svae_live": round(bit_err(fill_live), 4),
                "svae_map": round(bit_err(fill_map), 4),
                "svae_aot": round(bit_err(fill_aot), 4),
                "vae": round(bit_err(fill_vae), 4),
                "mean_fill": round(bit_err(p_mean), 4),
            }
        # The AOT tier must reproduce the live tier (both decode rules).
        row["aot_max_abs_diff"] = round(
            float(np.max(np.abs(fill_live - fill_aot))), 6)
        row["aot_map_max_abs_diff"] = round(
            float(np.max(np.abs(fill_map - fill_aot_map))), 6)
        out[ds] = row
        print(f"[impute/{ds}] {json.dumps(row)}", flush=True)

    Path("runs").mkdir(exist_ok=True)
    Path(args.json).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
