#!/usr/bin/env python
"""jax.profiler trace harness for the SVAE train step (SURVEY.md §6).

Writes a TensorBoard-loadable trace of the hot loop plus a wall-clock
breakdown. Use on TPU to inspect fusion/layout of the combine and decoder
stages:

    python benchmarks/profile_svae.py --trace-dir /tmp/svax-trace
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", type=str, default="/tmp/svax-trace")
    p.add_argument("--dataset", choices=["pinwheel", "auto", "mnist"], default="pinwheel")
    p.add_argument("--batch", type=int, default=400)
    p.add_argument("--num-components", "-K", type=int, default=10)
    p.add_argument("--latent-dim", "-L", type=int, default=2)
    p.add_argument("--num-samples", "-S", type=int, default=4)
    p.add_argument("--hidden", type=int, nargs="+", default=[50, 50])
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--nn-precision", choices=["highest", "high", "default"], default="highest")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from svax.data import load_dataset
    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_scan_runner

    train, _, meta = load_dataset(args.dataset, seed=0)
    x = jnp.asarray(train[: args.batch], dtype=jnp.float32)
    n = x.shape[0]
    config = SvaeConfig(
        latent_dim=args.latent_dim,
        num_components=args.num_components,
        num_samples=args.num_samples,
        likelihood=meta["likelihood"],
        num_total=n,
        nn_precision={
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
        }[args.nn_precision],
    )
    prior = gmm.make_prior(args.num_components, args.latent_dim)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    hidden = tuple(args.hidden)
    state = svae_step.init_state(
        key, x.shape[1], config, prior, opt, hidden, hidden, data=x
    )
    runner = make_scan_runner(
        svae_step.make_train_step(config, prior, opt, rho=0.05), args.steps
    )

    state, _ = runner(state, x, key)  # compile
    jax.block_until_ready(state.pgm_nat.dir_nat)

    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        state, metrics = runner(state, x, key)
        jax.block_until_ready(state.pgm_nat.dir_nat)
        dt = time.perf_counter() - t0

    print(f"backend={jax.default_backend()} steps={args.steps}")
    print(f"wall: {dt*1e3:.1f} ms  ({args.steps/dt:.0f} steps/s, {dt/args.steps*1e6:.0f} us/step)")
    print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
