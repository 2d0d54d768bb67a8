#!/usr/bin/env python
"""Anomaly detection with a served SVAE: train clean, score contaminated.

The deployment-side counterpart of experiments/robustness_demo.py (which
contaminates the TRAINING set): here the model trains on a clean pinwheel
and the serving layer's per-point importance-weighted log-likelihood is
used as an anomaly score on a held-out set with injected outliers. Reports
ROC-AUC of score-thresholding plus the score-distribution summary, for the
GMM-prior and (optionally) the Student-t-prior SVAE — test-time
contamination is the regime where the heavier-tailed prior's density
actually differs.

    python experiments/anomaly_demo.py [--platform cpu] [--steps 3000]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _auc(scores_pos: "np.ndarray", scores_neg: "np.ndarray") -> float:
    """ROC-AUC of 'low score ⇒ anomaly' via the rank statistic (exact)."""
    import numpy as np

    all_scores = np.concatenate([scores_pos, scores_neg])
    ranks = all_scores.argsort().argsort().astype(np.float64)
    n_pos, n_neg = len(scores_pos), len(scores_neg)
    # P(clean point scores higher than outlier) with tie-free ranks.
    r_pos = ranks[:n_pos].sum()
    return float((r_pos - n_pos * (n_pos - 1) / 2.0) / (n_pos * n_neg))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--outlier-fraction", type=float, default=0.15)
    p.add_argument("--outlier-scale", type=float, default=15.0,
                   help="half-width of the uniform outlier box. NOTE the "
                        "pinwheel itself spans ~±17, so the default box "
                        "overlaps the support heavily (AUC is capped well "
                        "below 1 by construction); pass 30+ for a "
                        "separated-outlier regime.")
    p.add_argument("--dof", type=float, default=4.0,
                   help="also evaluate an SMM-prior model (0 = GMM only)")
    p.add_argument("--num-components", "-K", type=int, default=10)
    p.add_argument("--iw-samples", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scan-chunk", type=int, default=500)
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from svax import serve
    from svax.data.pinwheel import make_pinwheel_data, make_pinwheel_with_outliers
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_scan_runner

    x_train = jnp.asarray(make_pinwheel_data(num_per_class=80, seed=args.seed),
                          jnp.float32)
    # Held-out set WITH outliers; labels < 0 mark the injected contamination.
    test_np, test_labels = make_pinwheel_with_outliers(
        outlier_fraction=args.outlier_fraction, num_per_class=60,
        outlier_scale=args.outlier_scale, seed=args.seed + 13,
    )
    is_out = np.asarray(test_labels) < 0
    n = x_train.shape[0]

    results = {"outlier_fraction": args.outlier_fraction,
               "outlier_scale": args.outlier_scale,
               "n_test": int(len(test_np)), "n_outliers": int(is_out.sum())}
    variants = [("gmm", 0.0)] + ([("smm", args.dof)] if args.dof > 0 else [])
    for name, dof in variants:
        spec = serve.ModelSpec(
            input_dim=2, latent_dim=2, num_components=args.num_components,
            likelihood="gaussian", encoder_hidden=(50, 50),
            decoder_hidden=(50, 50), num_samples=2, dof=dof, num_total=n,
        )
        config = spec.to_config()._replace(num_total=n)
        prior = spec.make_prior()
        opt = optax.adam(1e-3)
        key = jax.random.PRNGKey(args.seed)
        state = svae_step.init_state(
            key, 2, config, prior, opt, spec.encoder_hidden,
            spec.decoder_hidden, data=x_train,
        )
        model = None
        if dof > 0.0:
            from svax.models import svae_smm as model  # noqa: F811
        kwargs = {} if model is None else {"model": model}
        step = svae_step.make_train_step(config, prior, opt, rho=0.05, **kwargs)
        runner = make_scan_runner(step, args.scan_chunk)
        k = key
        t = 0
        while t < args.steps:
            todo = min(args.scan_chunk, args.steps - t)
            if todo != args.scan_chunk:
                runner = make_scan_runner(step, todo)
            k, kc = jax.random.split(k)
            state, _ = runner(state, x_train, kc)
            t += todo
        jax.block_until_ready(state.pgm_nat.dir_nat)

        server = serve.SvaeServer(state.nn_params, state.pgm_nat, spec,
                                  buckets=(1024,))
        scores = server.score(test_np, key=k, num_samples=args.iw_samples)
        results[name] = {
            "roc_auc": round(_auc(scores[~is_out], scores[is_out]), 4),
            "mean_score_clean": round(float(scores[~is_out].mean()), 3),
            "mean_score_outlier": round(float(scores[is_out].mean()), 3),
        }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
