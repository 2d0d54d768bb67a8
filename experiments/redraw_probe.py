#!/usr/bin/env python
"""Probe the redraw-protocol gap: amortization or variational family?

The redraw seed table (BASELINE.md; runs/seed_sweep_r3_redraw3.json)
stalls at 5/8 crossing the per-draw exact pure-GMM predictive, with the
below-bar draws (seeds 2, 4, 6) losing 0.03–0.49 nat. The claim "the
exact Bayesian predictive is a genuinely strong bar for an amortized
model" was asserted, not probed (VERDICT r3 item 4). This experiment
measures, per below-bar draw, the NON-AMORTIZED fit of the same
variational family: freeze the trained decoder + PGM naturals, replace
the encoder's per-point diagonal Gaussian potentials with free per-test-
point parameters (same softplus+floor parameterization as the encoder
head), and optimize them against the per-point structured ELBO — the
exact objective the encoder itself is trained on (recon − local KL;
the global term is constant in the potentials). This removes the
amortization constraint while keeping objective, family and decoder
fixed, so under the same IW(1000) scoring protocol:

  * if the locally-optimized potentials still stay below the per-draw
    bar, amortization is not the gap — the structured family plus this
    decoder cannot reach the exact predictive on these draws and the
    BASELINE claim stands with evidence;
  * if they cross, the gap is amortization/recipe — attackable.

`--objective iw` keeps the first attempt — optimizing the IW(64) bound
directly — as a reproducible NEGATIVE: the mixture-IW estimator's
proposal gradient is biased (the component choice is a non-reparameter-
ized Gumbel-argmax, so its score-function term is silently dropped) and
the optimization diverges (measured on v5e: objective −5.69 → −27.1 in
3000 steps on seed 2 while the ELBO objective improves monotonically).

Protocol per seed: reproduce the exact redraw-table run (aug 0.6,
best-of-3 restarts by train ELBO, 30000 steps, constant rho 0.05, same
PRNG keys), verify the amortized IW matches the table row, then local-
opt the test potentials (Adam, fresh IW-sample keys per step) and score
both with the table's protocol key and sample count.

Writes runs/redraw_probe.json.

`--data-seed 0` switches to the CANONICAL protocol (data fixed at the
seed-0 draw, --seeds vary the model init — seed_sweep's default mode).
The committed canonical artifact (runs/canonical_probe.json) was
produced with the canonical recipe, which differs from this script's
redraw-protocol defaults — reproduce it with the FULL command:

  python experiments/redraw_probe.py --data-seed 0 --seeds 3 6 \
      --aug 0.4 --restarts 2 --steps 15000

It found amortization slack ≤ 0.012 nat with 0.10/0.02 nat of family
gap remaining; the probe's XLA scan runner matches the megakernel
table rows to ~0.02 nat (different per-chunk key stream — see
BASELINE.md) — both quality protocols sit at the same family ceiling.

Usage: python experiments/redraw_probe.py [--seeds 2 4 6] [--opt-steps 3000]
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
    ap.add_argument("--seeds", type=int, nargs="+", default=[2, 4, 6])
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--restarts", type=int, default=3)
    ap.add_argument("--aug", type=float, default=0.6)
    ap.add_argument("--rho", type=float, default=0.05)
    ap.add_argument("--iw-samples", type=int, default=1000)
    ap.add_argument("--opt-steps", type=int, default=3000)
    ap.add_argument("--opt-iw-samples", type=int, default=64,
                    help="IW samples per local-opt gradient step")
    ap.add_argument("--opt-lr", type=float, default=1e-2)
    ap.add_argument("--objective", choices=["elbo", "iw"], default="elbo",
                    help="'elbo' = per-point structured ELBO (the training "
                         "objective, unbiased reparameterized grads); 'iw' "
                         "= the documented-negative direct IW(64) objective")
    ap.add_argument("--potential", choices=["diag", "full"], default="diag",
                    help="free-potential family: 'diag' matches the encoder "
                         "head (the round-4 probe); 'full' optimizes a full-"
                         "covariance per-point precision P = LLᵀ (Cholesky-"
                         "parameterized, init from the diag solution) — the "
                         "strictly larger message family, isolating whether "
                         "the residual family gap is the DIAGONAL constraint "
                         "or the mixture/decoder structure itself")
    ap.add_argument("--data-seed", type=int, default=None,
                    help="fix the pinwheel draw at this seed (CANONICAL "
                         "protocol: --seeds become MODEL seeds over one "
                         "shared draw, matching seed_sweep's default mode); "
                         "default None redraws the data per seed (the "
                         "round-2 redraw protocol)")
    ap.add_argument("--json", default="runs/redraw_probe.json")
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

    from svax.data import load_pinwheel
    from svax.models import evaluation
    from svax.models import svae as svae_mod
    from svax.models.svae import SvaeConfig
    from svax.nets import mlp as nets
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import augment_step, make_scan_runner

    k, s, lr = 10, 4, 1e-3
    config = SvaeConfig(latent_dim=2, num_components=k, num_samples=s,
                        num_total=400)
    prior = gmm.make_prior(k, 2, kappa=0.05)
    opt = optax.adam(lr)

    def gmm_bar(train_np, xtest):
        from svax.models import gmm_baseline

        xtr = jnp.asarray(train_np, jnp.float32)
        st = gmm_baseline.init_state(jax.random.PRNGKey(0), prior, xtr)
        step_g = jax.jit(gmm_baseline.make_train_step(
            prior, 1.0, len(train_np)))
        for _ in range(300):
            st, _m = step_g(st, xtr)
        return float(evaluation.gmm_predictive_log_prob(st.nat, xtest).mean())

    # ---- non-amortized IW machinery --------------------------------------
    def iw_from_potentials(pot_h, pot_p, decoder, exp, x, key, num_samples):
        """evaluation.svae_iw_loglik with the encoder replaced by free
        per-point potentials (same proposal family, same target)."""
        post = svae_mod.sin_combine(pot_h, pot_p, exp, jitter=config.jitter)
        k_cat, k_norm = jax.random.split(key)
        gumbel = jax.random.gumbel(
            k_cat, (num_samples,) + post.log_resp.shape, dtype=x.dtype)
        choice = jnp.argmax(post.log_resp[None] + gumbel, axis=-1)
        z_all = svae_mod.sample_posterior(k_norm, post, num_samples)
        z = jnp.take_along_axis(
            z_all, choice[..., None, None], axis=2)[:, :, 0, :]
        log_q = evaluation._mixture_log_q(z, post)
        log_prior = evaluation._expected_gmm_log_prob(z, exp)
        loglik = nets.log_likelihood(
            decoder, z, x[None], config.likelihood, config.activation)
        log_w = loglik + log_prior - log_q
        return jax.nn.logsumexp(log_w, axis=0) - jnp.log(float(num_samples))

    def local_elbo_from_potentials(pot_h, pot_p, decoder, exp, x, key):
        """Per-point structured ELBO (recon − local KL) with free potentials
        — svae.forward's weighted-mode math (svax/models/svae.py) minus the
        potential-independent global term; grads are fully reparameterized
        (responsibility-weighted over ALL K, no categorical draw)."""
        post = svae_mod.sin_combine(pot_h, pot_p, exp, jitter=config.jitter)
        resp = jnp.exp(post.log_resp)
        z = svae_mod.sample_posterior(key, post, config.num_samples)
        loglik = nets.log_likelihood(
            decoder, z, x[None, :, None, :], config.likelihood,
            config.activation)
        recon_n = jnp.sum(resp * jnp.mean(loglik, axis=0), axis=-1)
        return recon_n - svae_mod.local_kl_term(post, exp)

    floor = nets._VAR_FLOOR
    d_lat = config.latent_dim
    tril_r, tril_c = np.tril_indices(d_lat, -1)

    def softplus_inv(y):
        # stable for large y (softplus(y) ≈ y): avoids expm1 overflow
        y = np.clip(y, 1e-10, None)
        return np.where(y > 30.0, y, np.log(np.expm1(y)))

    if args.potential == "diag":
        def potentials(params):
            var = jax.nn.softplus(params["raw"]) + floor
            p = 1.0 / var
            return params["mean"] * p, p

        def init_params(pot_h, pot_p):
            var0 = np.asarray(1.0 / pot_p, np.float64)
            return {
                "mean": jnp.asarray(np.asarray(pot_h / pot_p)),
                "raw": jnp.asarray(
                    softplus_inv(np.maximum(var0 - floor, 1e-8)).astype(
                        np.float32)),
            }
    else:
        # Full-covariance potential: P = L Lᵀ, L lower-triangular with a
        # softplus-positive diagonal; h = P·mean. Strictly contains the
        # diagonal family (off = 0 reproduces it exactly).
        def potentials(params):
            ldiag = jax.nn.softplus(params["raw_diag"]) + 1e-4
            n_pts = ldiag.shape[0]
            ell = jnp.zeros((n_pts, d_lat, d_lat), ldiag.dtype)
            idx = jnp.arange(d_lat)
            ell = ell.at[:, idx, idx].set(ldiag)
            if len(tril_r):
                ell = ell.at[:, tril_r, tril_c].set(params["off"])
            p_full = jnp.einsum("nij,nkj->nik", ell, ell)
            h = jnp.einsum("nij,nj->ni", p_full, params["mean"])
            return h, p_full

        def init_params(pot_h, pot_p):
            p0 = np.asarray(pot_p, np.float64)
            return {
                "mean": jnp.asarray(np.asarray(pot_h / pot_p)),
                "raw_diag": jnp.asarray(
                    softplus_inv(np.maximum(np.sqrt(p0) - 1e-4, 1e-8))
                    .astype(np.float32)),
                "off": jnp.zeros((p0.shape[0], len(tril_r)), jnp.float32),
            }

    def local_opt_bound(state, xt, seed):
        """Optimize per-test-point potentials against the IW objective."""
        exp = gmm.expected_params(state.pgm_nat)
        decoder = state.nn_params["decoder"]
        pot_h, pot_p = nets.encoder_apply(state.nn_params["encoder"], xt)
        params = init_params(pot_h, pot_p)
        lopt = optax.adam(args.opt_lr)
        lstate = lopt.init(params)

        def objective(prms, key):
            h, p = potentials(prms)
            if args.objective == "iw":
                return -jnp.mean(iw_from_potentials(
                    h, p, decoder, exp, xt, key, args.opt_iw_samples))
            return -jnp.mean(local_elbo_from_potentials(
                h, p, decoder, exp, xt, key))

        def one(carry, key):
            prms, ls = carry
            loss, grads = jax.value_and_grad(objective)(prms, key)
            updates, ls = lopt.update(grads, ls, prms)
            return (optax.apply_updates(prms, updates), ls), loss

        @jax.jit
        def run_chunk(prms, ls, keys):
            (prms, ls), losses = jax.lax.scan(one, (prms, ls), keys)
            return prms, ls, losses

        kk = jax.random.PRNGKey(31000 + seed)
        chunk = 250
        first_loss = last_loss = None
        for c in range(args.opt_steps // chunk):
            kk, sub = jax.random.split(kk)
            params, lstate, losses = run_chunk(
                params, lstate, jax.random.split(sub, chunk))
            if first_loss is None:
                first_loss = float(jnp.mean(losses[:25]))
            last_loss = float(jnp.mean(losses[-25:]))
        h, p = potentials(params)
        score = jax.jit(lambda key: jnp.mean(iw_from_potentials(
            h, p, decoder, exp, xt, key, args.iw_samples)))
        traj = {"opt_obj_first": round(-first_loss, 3),
                "opt_obj_last": round(-last_loss, 3)}
        return float(score(jax.random.PRNGKey(seed + 999))), traj

    # ---- the exact redraw-table training recipe --------------------------
    iw_eval = jax.jit(
        lambda nn, nat, xtest, key: jnp.mean(evaluation.svae_iw_loglik(
            nn, nat, xtest, key, config, num_samples=args.iw_samples)))
    base_step = svae_step.make_train_step(config, prior, opt, rho=args.rho)
    step = augment_step(base_step, args.aug)
    runner = make_scan_runner(step, args.chunk)

    rows = []
    for seed in args.seeds:
        train, test = load_pinwheel(
            seed=seed if args.data_seed is None else args.data_seed)
        x = jnp.asarray(train, jnp.float32)
        xt = jnp.asarray(test, jnp.float32)
        bar = gmm_bar(train, xt)
        t0 = time.perf_counter()
        best = None
        for r in range(args.restarts):
            key = jax.random.PRNGKey(seed + 1000 * r)
            state = svae_step.init_state(key, 2, config, prior, opt,
                                         (50, 50), (50, 50), data=x)
            kk = key
            for c in range(args.steps // args.chunk):
                kk = jax.random.fold_in(kk, c)
                state, metrics = runner(state, x, kk)
            tr_elbo = float(metrics["elbo"][-1])
            if best is None or tr_elbo > best[0]:
                best = (tr_elbo, state)
        _, state = best
        amortized = float(iw_eval(state.nn_params, state.pgm_nat, xt,
                                  jax.random.PRNGKey(seed + 999)))
        t_train = time.perf_counter() - t0
        localopt, traj = local_opt_bound(state, xt, seed)
        row = {
            "seed": seed,
            "gmm_bar": round(bar, 3),
            "amortized_iw": round(amortized, 3),
            "localopt_iw": round(localopt, 3),
            "amortization_gap": round(localopt - amortized, 3),
            "family_gap_vs_bar": round(bar - localopt, 3),
            "localopt_crosses": bool(localopt > bar),
            "train_wall_s": round(t_train, 1),
            **traj,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    crossed = sum(r["localopt_crosses"] for r in rows)
    verdict = (
        "family/model gap — the exact predictive is unreachable for this "
        "variational family on ALL probed draws" if crossed == 0 else
        "amortization/recipe gap on ALL probed draws — attackable"
        if crossed == len(rows) else
        f"mixed: {crossed}/{len(rows)} draws cross once amortization is "
        "removed (recipe-attackable); the rest are family/model gaps — "
        "see per-row amortization_gap vs family_gap_vs_bar")
    proto_name = ("redraw-table" if args.data_seed is None
                  else f"canonical-table (draw fixed at seed "
                       f"{args.data_seed})")
    summary = {
        "protocol": (f"{proto_name} recipe (aug{args.aug}+rs{args.restarts}"
                     f"+steps{args.steps}) on the below-bar draws; local-opt"
                     f" = per-test-point {args.potential} potentials vs the "
                     f"{args.objective} objective ({args.opt_steps} Adam "
                     f"steps, lr {args.opt_lr}), decoder+PGM frozen; scored "
                     f"with IW({args.iw_samples})"),
        "rows": rows,
        "localopt_crossing": f"{crossed}/{len(rows)}",
        "verdict": verdict,
    }
    Path(args.json).parent.mkdir(exist_ok=True)
    Path(args.json).write_text(json.dumps(summary, indent=1))
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
