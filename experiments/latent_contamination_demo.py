#!/usr/bin/env python
"""Latent-contamination demo: the SMM update rule's end-to-end win case.

BASELINE.md's robustness studies showed that when outliers are present
DURING NN training, the encoder learns to place them at ordinary latent
radii and the Student-t prior has nothing to act on. Its value case is
**latent-space contamination** — which arises in the standard serving
pattern this demo models:

1. Train a GMM-prior SVAE on a clean pinwheel; **freeze the NN** (the
   deployed encoder/decoder).
2. Keep adapting the PGM online with cheap CVI steps on a drifting
   stream that contains box outliers. The frozen encoder has never seen
   them, so they land at extreme latent positions — true latent
   contamination (unit-verified in tests/test_svae_smm.py).
3. Compare the two update rules from the SAME initial naturals:
   * **GMM rule** — plain responsibilities/latent moments
     (svax.pgm.gmm.suff_stats_from_moments);
   * **SMM rule** — the u–z coordinate combine with u-weighted moments
     (svax.models.svae_smm.smm_combine / suff_stats_latent, dof=4):
     E[u] = (a0+d/2)/(b0+Q/2) downweights large latent quadratics Q.
4. Score the CLEAN held-out set under each adapted PGM with the same
   frozen NN and the same IW bound (both rules emit GmmNat, so the
   estimator is identical — only the update rule differs). Clean-stream
   controls show the SMM rule is not just "failing to adapt".

Writes one JSON summary (--json) and prints it.

    python experiments/latent_contamination_demo.py [--platform cpu]
        [--online-steps 500] [--outlier-fraction 0.25]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrain-steps", type=int, default=15000)
    p.add_argument("--online-steps", type=int, default=500)
    p.add_argument("--batch", type=int, default=400)
    p.add_argument("--rho", type=float, default=0.05)
    p.add_argument("--outlier-fraction", type=float, default=0.25)
    p.add_argument("--box", type=float, default=30.0,
                   help="outliers ~ Uniform([-box, box]^2); the pinwheel "
                        "support is ~±17")
    p.add_argument("--dof", type=float, default=4.0)
    p.add_argument("--smm-iters", type=int, default=2)
    p.add_argument("--aug-noise", type=float, default=0.4)
    p.add_argument("--iw-samples", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scan-chunk", type=int, default=1000)
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument(
        "--activation", choices=["tanh", "relu"], default="tanh",
        help="NN hidden activation. tanh saturates, so far input-space "
             "outliers reach the latent space compressed; relu passes "
             "magnitudes through (see robustness_demo.py).",
    )
    p.add_argument("--json", type=str, default="runs/latent_contamination.json")
    args = p.parse_args()

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

    from svax.data.pinwheel import load_pinwheel, make_pinwheel_data
    from svax.models import evaluation, svae, svae_smm
    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm, natgrad, smm
    from svax.train import svae_step
    from svax.train.loop import augment_step, make_scan_runner

    # ---- 1. Pretrain on the clean pinwheel (pinned headline recipe). ----
    train, test = load_pinwheel(seed=args.seed)
    x = jnp.asarray(train, jnp.float32)
    x_test = jnp.asarray(test, jnp.float32)
    n = x.shape[0]
    act = {"tanh": jnp.tanh, "relu": jax.nn.relu}[args.activation]
    config = SvaeConfig(latent_dim=2, num_components=10, num_samples=4,
                        num_total=n, activation=act)
    prior = jax.tree.map(
        lambda a: a.astype(jnp.float32), gmm.make_prior(10, 2, kappa=0.05)
    )
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(args.seed)
    state = svae_step.init_state(key, 2, config, prior, opt, (50, 50),
                                 (50, 50), data=x)
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state
    )
    base_step = svae_step.make_train_step(config, prior, opt, rho=args.rho)

    runner = make_scan_runner(augment_step(base_step, args.aug_noise),
                              args.scan_chunk)
    k = key
    for i in range(max(args.pretrain_steps // args.scan_chunk, 1)):
        k = jax.random.fold_in(k, i)
        state, metrics = runner(state, x, k)
    elbo0 = float(metrics["elbo"][-1]) / n
    nn = state.nn_params  # frozen from here on
    nat0 = state.pgm_nat

    # ---- 2. Build the streams (T, batch, 2). ----
    rng = np.random.default_rng(args.seed + 1)
    t_steps = args.online_steps
    n_out = int(round(args.outlier_fraction * args.batch))
    n_clean = args.batch - n_out

    def fresh_clean(count):
        # Fresh pinwheel draws (same generative process, new randomness).
        per = count // 5 + 1
        d_ = make_pinwheel_data(num_per_class=per,
                                seed=int(rng.integers(1 << 31)))
        idx = rng.permutation(d_.shape[0])[:count]
        return d_[idx]

    clean_stream = np.stack(
        [fresh_clean(args.batch) for _ in range(t_steps)]
    ).astype(np.float32)
    contam_stream = clean_stream.copy()
    contam_stream[:, n_clean:, :] = rng.uniform(
        -args.box, args.box, size=(t_steps, n_out, 2)
    ).astype(np.float32)
    out_mask = np.zeros((args.batch,), np.float32)
    out_mask[n_clean:] = 1.0
    out_mask = jnp.asarray(out_mask)

    # ---- 3. Online CVI-only adaptation with the frozen NN. ----
    from svax.nets import mlp as nets

    scale = float(config.num_total) / args.batch

    def encode(xb):
        return nets.encoder_apply(nn["encoder"], xb, config.activation,
                                  config.nn_precision)

    def gmm_online(nat, xb):
        pot_h, pot_p = encode(xb)
        exp = gmm.expected_params(nat)
        post = svae.sin_combine(pot_h, pot_p, exp, jitter=config.jitter)
        resp = jnp.exp(post.log_resp)
        ezz = post.cov + post.mean[..., :, None] * post.mean[..., None, :]
        stats = gmm.suff_stats_from_moments(resp, post.mean, ezz, scale)
        nat = natgrad.cvi_update(nat, prior, gmm.stats_to_nat(stats), args.rho)
        # Responsibility-weighted E[u] is 1 by definition under the GMM rule.
        return nat, jnp.ones(())

    def smm_online(nat, xb):
        pot_h, pot_p = encode(xb)
        exp = gmm.expected_params(nat)
        post, _ = svae_smm.smm_combine(
            pot_h, pot_p, exp, args.dof, args.smm_iters, config.jitter
        )
        stats = svae_smm.suff_stats_latent(post, scale)
        nat = natgrad.cvi_update(nat, prior, smm.stats_to_nat(stats), args.rho)
        resp = jnp.exp(post.log_resp)
        e_u_point = jnp.sum(resp * post.e_u, axis=-1)  # (N,)
        return nat, e_u_point

    def run_online(rule, stream):
        def body(nat, xb):
            nat, aux = rule(nat, xb)
            return nat, aux

        nat_final, aux = jax.jit(
            lambda nat, s: jax.lax.scan(body, nat, s)
        )(nat0, jnp.asarray(stream))
        return nat_final, aux

    results = {}
    nat_gmm, _ = run_online(gmm_online, contam_stream)
    nat_smm, e_u_tr = run_online(smm_online, contam_stream)
    nat_gmm_clean, _ = run_online(gmm_online, clean_stream)
    nat_smm_clean, _ = run_online(smm_online, clean_stream)

    # Mechanism evidence: mean E[u] on clean vs outlier stream rows
    # (averaged over the second half of the online phase).
    e_u_tr = np.asarray(e_u_tr)[t_steps // 2:]
    e_u_clean = float((e_u_tr * (1 - np.asarray(out_mask))).sum()
                      / ((1 - np.asarray(out_mask)).sum() * e_u_tr.shape[0]))
    e_u_out = float((e_u_tr * np.asarray(out_mask)).sum()
                    / (np.asarray(out_mask).sum() * e_u_tr.shape[0])) \
        if n_out else float("nan")

    # ---- 4. Score the clean test set under each adapted PGM. ----
    iw_key = jax.random.PRNGKey(args.seed + 2)

    @jax.jit
    def iw(nat):
        return jnp.mean(evaluation.svae_iw_loglik(
            nn, nat, x_test, iw_key, config, num_samples=args.iw_samples
        ))

    rows = {
        "pretrained": float(iw(nat0)),
        "gmm_rule_contaminated": float(iw(nat_gmm)),
        "smm_rule_contaminated": float(iw(nat_smm)),
        "gmm_rule_clean_control": float(iw(nat_gmm_clean)),
        "smm_rule_clean_control": float(iw(nat_smm_clean)),
    }
    results = {
        "config": vars(args),
        "pretrain_final_train_elbo_per_point": elbo0,
        "clean_test_iw_per_point": rows,
        "smm_win_nats": rows["smm_rule_contaminated"]
        - rows["gmm_rule_contaminated"],
        "mean_e_u_second_half": {"clean_rows": e_u_clean,
                                 "outlier_rows": e_u_out},
    }
    print(json.dumps(results, indent=1), flush=True)
    if args.json:
        Path(args.json).parent.mkdir(parents=True, exist_ok=True)
        Path(args.json).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
