#!/usr/bin/env python
"""Standalone evaluation: restore a checkpoint, report held-out metrics.

SURVEY.md §4.4 evaluation entry point. Computes the test ELBO
decomposition, the importance-weighted log-likelihood bound, and (for 2-D
data) a latent-space plot.

    python experiments/evaluate.py --checkpoint-dir ckpt --dataset pinwheel
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", type=str, required=True)
    p.add_argument("--dataset", choices=["pinwheel", "auto", "mnist"], default="pinwheel")
    p.add_argument("--num-components", "-K", type=int, default=10)
    p.add_argument("--latent-dim", "-L", type=int, default=2)
    p.add_argument("--num-samples", "-S", type=int, default=4)
    p.add_argument("--encoder-hidden", type=int, nargs="+", default=[50, 50])
    p.add_argument("--decoder-hidden", type=int, nargs="+", default=[50, 50])
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--kappa", type=float, default=0.05)
    p.add_argument("--iw-samples", type=int, default=200)
    p.add_argument("--smm-dof", type=float, default=0.0,
                   help="evaluate an SMM-prior checkpoint (Student-t dof; 0 = GMM)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument("--plot", type=str, default="")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from svax.data import load_dataset
    from svax.models import evaluation, svae
    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.checkpoint import Checkpointer

    train, test, meta = load_dataset(args.dataset, seed=args.seed)
    x_test = jnp.asarray(test, dtype=jnp.float32)
    n, input_dim = train.shape

    config = SvaeConfig(
        latent_dim=args.latent_dim,
        num_components=args.num_components,
        num_samples=args.num_samples,
        likelihood=meta["likelihood"],
        num_total=n,
        dof=args.smm_dof,
    )
    if args.smm_dof > 0.0:
        from svax.models import svae_smm as model
    else:
        model = svae
    prior = gmm.make_prior(args.num_components, args.latent_dim, alpha=args.alpha, kappa=args.kappa)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(args.seed)
    template = svae_step.init_state(
        key, input_dim, config, prior, opt,
        tuple(args.encoder_hidden), tuple(args.decoder_hidden),
    )
    ckpt = Checkpointer(args.checkpoint_dir)
    state, key, step = ckpt.restore_or(template, key)
    ckpt.close()
    if step == 0:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")

    evaluate = jax.jit(svae_step.make_eval_fn(config, prior, model=model))
    ev = evaluate(state, x_test, key)
    iw_fn = (
        evaluation.svae_smm_iw_loglik if args.smm_dof > 0.0
        else evaluation.svae_iw_loglik
    )
    iw = iw_fn(
        state.nn_params, state.pgm_nat, x_test, key, config, args.iw_samples
    )
    print(
        json.dumps(
            {
                "checkpoint_step": step,
                "test_elbo_per_point": float(ev["elbo_per_point"]),
                "test_recon_per_point": float(ev["recon_per_point"]),
                "test_iw_loglik_per_point": float(jnp.mean(iw)),
                "iw_samples": args.iw_samples,
            }
        )
    )

    if args.plot:
        import numpy as np

        from svax.utils import viz

        out = model.forward(
            state.nn_params, state.pgm_nat, prior, x_test, key,
            config._replace(num_samples=1),
        )
        resp = np.exp(np.asarray(out.posterior.log_resp))
        z_mean = np.einsum("nk,nkd->nd", resp, np.asarray(out.posterior.mean))
        viz.plot_latent_space(z_mean, resp, state.pgm_nat, args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
