#!/usr/bin/env python
"""Serving-path latency: bucketed endpoints on real hardware.

Builds a small trained SVAE in-process, wraps it in ``svax.serve``'s
``SvaeServer``, and measures steady-state (post-compile) latency of each
endpoint at several request sizes — the number a deployment actually
cares about. Every request shape maps onto the fixed bucket ladder, so
after the first call per bucket there are NO recompiles; what remains is
dispatch + device time.

Run on TPU:  python benchmarks/bench_serve.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from svax import serve
    from svax.data import make_pinwheel_data
    from svax.train import svae_step

    spec = serve.ModelSpec(
        input_dim=2, latent_dim=2, num_components=10, likelihood="gaussian",
        encoder_hidden=(50, 50), decoder_hidden=(50, 50), num_samples=4,
        num_total=400,
    )
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(make_pinwheel_data(num_per_class=80, seed=0), jnp.float32)
    config = spec.to_config()._replace(num_total=x.shape[0])
    prior = spec.make_prior()
    opt = optax.adam(1e-3)
    state = svae_step.init_state(
        key, 2, config, prior, opt, spec.encoder_hidden, spec.decoder_hidden,
        data=x,
    )
    step = jax.jit(svae_step.make_train_step(config, prior, opt, rho=0.1))
    for i in range(50):
        state, _ = step(state, x, jax.random.fold_in(key, i))
    server = serve.SvaeServer(state.nn_params, state.pgm_nat, spec)

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    for n in (1, 32, 512, 4096):
        batch = rng.standard_normal((n, 2)).astype(np.float32)
        for name, call in (
            ("encode", lambda b: server.encode(b)["z_mean"]),
            ("reconstruct", server.reconstruct),
            ("score", lambda b: server.score(b, num_samples=50)),
        ):
            call(batch)  # compile the bucket
            times = []
            for _ in range(20):
                t0 = time.perf_counter()
                out = call(batch)
                np.asarray(out)  # host sync
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times) * 1e3)
            print(json.dumps({
                "endpoint": name, "batch": n,
                "p50_ms": round(ms, 3),
                "per_point_us": round(1e3 * ms / n, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
