#!/usr/bin/env python
"""SMM-prior SVAE step cost: envelope grads, full backward, megakernel.

The SMM u–z coordinate rounds (svax/models/svae_smm.py) cost ~4.7× the
GMM-prior step (r2 measurement). ``SvaeConfig.smm_envelope_grads`` stops
the converged q(u) parameters' cotangents (envelope theorem), dropping
``smm_iters`` whole combine chains from the backward pass. Round 4 adds
the tinystep megakernel rows (``dof > 0`` runs the u–z rounds in-kernel,
svax/ops/tinystep_pallas.py) — the op-count attack the GMM prior got in
round 3, applied to the SMM prior (VERDICT r3 item 5). Paired-chunk
timing throughout (fixed per-launch overhead cancelled; scalar host
reads as sync — see bench.py).

Run on TPU:  python benchmarks/bench_smm_step.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHUNK = 1000
N_CHUNKS = 8


def _steps_per_sec(config, x, smm: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from svax.models import svae_smm
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_scan_runner

    prior = jax.tree.map(
        lambda a: a.astype(jnp.float32), gmm.make_prior(10, 2, kappa=0.05)
    )
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(key, 2, config, prior, opt, (50, 50), (50, 50),
                                 data=x)
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state
    )
    model = svae_smm if smm else None
    kw = {"model": svae_smm} if smm else {}
    step = svae_step.make_train_step(config, prior, opt, rho=0.05, **kw)

    def median_time(c):
        runner = make_scan_runner(step, c)
        st, _ = runner(state, x, key)
        float(st.pgm_nat.dir_nat.ravel()[0])
        ts = []
        for i in range(N_CHUNKS):
            t0 = time.perf_counter()
            st, m = runner(st, x, jax.random.fold_in(key, i))
            float(st.pgm_nat.dir_nat.ravel()[0])
            ts.append(time.perf_counter() - t0)
        assert bool(jnp.isfinite(m["elbo"][-1]))
        return float(np.median(ts))

    t1 = median_time(CHUNK)
    t2 = median_time(2 * CHUNK)
    return CHUNK / (t2 - t1)


def _mega_steps_per_sec(config, x):
    """Tinystep megakernel (dof>0 = in-kernel SMM u–z rounds) marginal."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_megakernel_runner

    prior = jax.tree.map(
        lambda a: a.astype(jnp.float32), gmm.make_prior(10, 2, kappa=0.05)
    )
    opt = optax.adam(1e-3)
    state = svae_step.init_state(jax.random.PRNGKey(0), 2, config, prior,
                                 opt, (50, 50), (50, 50), data=x)
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, state
    )
    runner = make_megakernel_runner(config, prior, lr=1e-3, rho=0.05,
                                    batch_size=0)

    def median_time(c):
        st, _ = runner(state, x, c, seed=0)
        float(st.pgm_nat.dir_nat.ravel()[0])
        ts = []
        for i in range(N_CHUNKS):
            t0 = time.perf_counter()
            st, m = runner(st, x, c, seed=i + 1)
            float(st.pgm_nat.dir_nat.ravel()[0])
            ts.append(time.perf_counter() - t0)
        assert bool(jnp.isfinite(m["elbo"][-1]))
        return float(np.median(ts))

    t1 = median_time(CHUNK)
    t2 = median_time(2 * CHUNK)
    return CHUNK / (t2 - t1)


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from svax.data import load_pinwheel
    from svax.models.svae import SvaeConfig

    train, _ = load_pinwheel(seed=0)
    x = jnp.asarray(train, dtype=jnp.float32)
    base = dict(latent_dim=2, num_components=10, num_samples=4,
                num_total=x.shape[0])
    rows = {}
    rows["gmm_prior"] = _steps_per_sec(SvaeConfig(**base), x, smm=False)
    rows["smm_full_bwd"] = _steps_per_sec(
        SvaeConfig(**base, dof=4.0, smm_iters=2), x, smm=True)
    rows["smm_envelope"] = _steps_per_sec(
        SvaeConfig(**base, dof=4.0, smm_iters=2, smm_envelope_grads=True),
        x, smm=True)
    # Megakernel rows at BOTH dot precisions: the default HIGH config maps
    # to HIGHEST (6-pass) kernel dots — parity-class but MXU-pass-bound at
    # this shape (~121 µs/step, docs/DESIGN.md §3c); the headline engine
    # runs DEFAULT single-pass bf16 dots. The SMM u–z rounds themselves
    # are nearly free (measured: iters 1/2/4 within noise at HIGHEST).
    dflt = jax.lax.Precision.DEFAULT
    rows["smm_mega_envelope"] = _mega_steps_per_sec(
        SvaeConfig(**base, dof=4.0, smm_iters=2, smm_envelope_grads=True), x)
    rows["smm_mega_full_bwd"] = _mega_steps_per_sec(
        SvaeConfig(**base, dof=4.0, smm_iters=2), x)
    rows["smm_mega_envelope_default"] = _mega_steps_per_sec(
        SvaeConfig(**base, dof=4.0, smm_iters=2, smm_envelope_grads=True,
                   nn_precision=dflt), x)
    rows["smm_mega_full_bwd_default"] = _mega_steps_per_sec(
        SvaeConfig(**base, dof=4.0, smm_iters=2, nn_precision=dflt), x)
    rows["gmm_mega_default"] = _mega_steps_per_sec(
        SvaeConfig(**base, nn_precision=dflt), x)
    print(json.dumps({
        "shape": "pinwheel N=400 K=10 d=2 S=4",
        "steps_per_sec": {k: round(v, 1) for k, v in rows.items()},
        "smm_vs_gmm_full": round(rows["gmm_prior"] / rows["smm_full_bwd"], 2),
        "smm_vs_gmm_envelope": round(
            rows["gmm_prior"] / rows["smm_envelope"], 2),
        "envelope_speedup": round(
            rows["smm_envelope"] / rows["smm_full_bwd"], 2),
        "mega_vs_xla_envelope": round(
            rows["smm_mega_envelope"] / rows["smm_envelope"], 2),
        "mega_default_vs_xla_envelope": round(
            rows["smm_mega_envelope_default"] / rows["smm_envelope"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
