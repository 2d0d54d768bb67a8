#!/usr/bin/env python
"""Train the plain-VAE baseline (SURVEY.md §4.3, reference ``vae.py``).

Example:
    python experiments/train_vae.py --dataset pinwheel --steps 2000
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
    p.add_argument("--dataset", choices=["pinwheel", "auto", "mnist"], default="pinwheel")
    p.add_argument("--latent-dim", "-L", type=int, default=2)
    p.add_argument("--num-samples", "-S", type=int, default=1)
    p.add_argument("--encoder-hidden", type=int, nargs="+", default=[50, 50])
    p.add_argument("--decoder-hidden", type=int, nargs="+", default=[50, 50])
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument("--logfile", type=str, default="")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from svax.data import load_dataset
    from svax.models import vae

    train, test, meta = load_dataset(args.dataset, seed=args.seed)
    x_train = jnp.asarray(train, dtype=jnp.float32)
    x_test = jnp.asarray(test, dtype=jnp.float32)
    n, input_dim = x_train.shape
    batch = args.batch_size if args.batch_size > 0 else n

    config = vae.VaeConfig(
        latent_dim=args.latent_dim,
        num_samples=args.num_samples,
        likelihood=meta["likelihood"],
    )
    opt = optax.adam(args.lr)
    key = jax.random.PRNGKey(args.seed)
    state = vae.init_state(
        key, input_dim, config, opt, tuple(args.encoder_hidden), tuple(args.decoder_hidden)
    )
    step = jax.jit(vae.make_train_step(config, opt))
    eval_elbo = jax.jit(lambda params, x, k: vae.elbo(params, x, k, config)[0])

    logf = open(args.logfile, "a") if args.logfile else None
    print(f"devices={jax.devices()} dataset={args.dataset} n={n} D={input_dim}")

    k = key
    state_w, _ = step(state, x_train[:batch], k)
    jax.block_until_ready(jax.tree.leaves(state_w.params)[0])

    t0 = time.perf_counter()
    for t in range(args.steps):
        k, kb, ks = jax.random.split(k, 3)
        xb = (
            x_train[jax.random.choice(kb, n, (batch,), replace=False)]
            if batch < n
            else x_train
        )
        state, metrics = step(state, xb, ks)
        if (t + 1) % args.eval_every == 0 or t == 0:
            row = {
                "step": t + 1,
                "elbo_per_point": float(metrics["elbo_per_point"]),
                "test_elbo_per_point": float(eval_elbo(state.params, x_test, k)),
            }
            print(json.dumps(row))
            if logf:
                logf.write(json.dumps(row) + "\n")
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    print(f"steps/sec: {args.steps / (time.perf_counter() - t0):.1f}")
    if logf:
        logf.close()


if __name__ == "__main__":
    main()
