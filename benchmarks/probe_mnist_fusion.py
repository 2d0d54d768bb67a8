#!/usr/bin/env python
"""Whole-step-fusion headroom probe for the mnist-svae shape (VERDICT r4 #6).

The pinned mnist-svae step (fused combine + bf16 decoder + kernel_rng) is
memory-bound at ~87% of HBM peak *for its current formulation*. The
tinystep/flexstep playbook — fuse encoder→combine→sample→decode→vjp into
ONE kernel so inter-kernel activations never touch HBM — shrinks the
working set the roofline is computed on. Before building a third kernel
class for the 784-wide shape, this probe measures the CEILING of that
attack:

  1. paired-chunk step time + XLA cost-analysis HBM bytes of the pinned
     step (the measured denominators);
  2. an analytic inventory of every tensor that crosses a kernel/stage
     boundary at this shape (encoder potentials, z, responsibilities,
     per-row logliks, and their backward cotangents) — the ONLY traffic
     whole-step fusion can remove that the current two-kernel formulation
     still pays;
  3. the irreducible traffic fusion cannot remove: weights+Adam state
     (read/update every step), the data batch (N rows into the encoder;
     S·N·K row-broadcasts into the decoder loss — already bf16), and the
     CVI statistics/naturals.

Verdict = boundary bytes as a fraction of measured step bytes. If the
fraction is small, the fusion's best case is a same-small step-time win
and the attack is closed as measured-negative (BASELINE.md), matching
how the mixstep occupancy probe was closed in round 4.

Run on TPU:  python benchmarks/probe_mnist_fusion.py
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

    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_scan_runner

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # The pinned mnist-svae shape (configs/__init__.py).
    n, d_in, d, k, s, h = 256, 784, 8, 10, 1, 200
    config = SvaeConfig(
        latent_dim=d, num_components=k, num_samples=s,
        likelihood="bernoulli", num_total=n,
        nn_compute_dtype="bfloat16", fused_combine=True, kernel_rng=True,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((n, d_in)) > 0.7).astype(np.float32))
    prior = gmm.make_prior(k, d)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(key, d_in, config, prior, opt,
                                 (h, h), (h, h), data=x)
    step = svae_step.make_train_step(config, prior, opt, rho=0.1)

    ca = jax.jit(step).lower(state, x, key).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    bytes_total = float(ca.get("bytes accessed", 0.0)) or sum(
        v for kk, v in ca.items()
        if kk.startswith("bytes accessed") and isinstance(v, float)
    )

    def median_time(chunk, n_chunks=5):
        r = make_scan_runner(step, chunk)
        st, _ = r(state, x, key)
        float(st.pgm_nat.dir_nat.ravel()[0])
        ts = []
        for i in range(n_chunks):
            t0 = time.perf_counter()
            st, _m = r(st, x, jax.random.fold_in(key, i))
            float(st.pgm_nat.dir_nat.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    chunk = 200
    t1 = median_time(chunk)
    t2 = median_time(2 * chunk)
    dt = (t2 - t1) / chunk
    suspect = dt <= 0.0
    if suspect:
        dt = t1 / chunk

    # ---- boundary-activation inventory (f32 = 4B unless noted) ----------
    f32, bf16 = 4, 2
    rows = s * n * k  # decoder-loss row count
    boundary = {
        # encoder → combine: Gaussian potential (h, P diag), fwd + bwd cotangents
        "encoder_potentials_fwd+bwd": 2 * (2 * n * d * f32),
        # combine → decoder: z samples fwd + dz bwd
        "z_fwd+bwd": 2 * (rows * d * f32),
        # combine → loss weighting: responsibilities fwd + bwd
        "resp_fwd+bwd": 2 * (n * k * f32),
        # decoder → loss: per-row loglik fwd + cotangent bwd
        "row_loglik_fwd+bwd": 2 * (rows * f32),
        # combine local-KL / stats scalars and (K,d)+(K,d,d) stats
        "combine_stats": (k * d + k * d * d + n) * f32,
    }
    boundary_bytes = float(sum(boundary.values()))

    # ---- irreducible traffic fusion cannot remove ------------------------
    p_enc = d_in * h + h * h + h * 2 * d + (h + h + 2 * d)
    p_dec = d * h + h * h + h * d_in + (h + h + d_in)
    params = p_enc + p_dec
    irreducible = {
        # params: read for fwd, read for bwd recompute (bf16 body), grads
        # written, Adam m/v read+write, params written
        "weights+grads+adam": params * (f32 * 6 + bf16 * 2),
        # x into the encoder (f32) + broadcast into the decoder loss rows
        # (bf16 body) fwd and recompute-bwd
        "x_streams": n * d_in * f32 + 2 * rows * d_in * bf16,
        "naturals+cvi": 2 * (k + k * d + k * d * d + k + k) * f32,
    }
    irreducible_bytes = float(sum(irreducible.values()))

    out = {
        "shape": {"n": n, "d_in": d_in, "d": d, "k": k, "s": s, "hidden": h},
        "ms_per_step": round(dt * 1e3, 4),
        "steps_per_sec": round(1.0 / dt, 1),
        "timing_suspect": suspect,
        "xla_bytes_per_step_mb": round(bytes_total / 1e6, 2),
        "achieved_gbs": round(bytes_total / dt / 1e9, 1),
        "boundary_bytes_kb": round(boundary_bytes / 1e3, 1),
        "boundary_detail_kb": {kk: round(v / 1e3, 1)
                               for kk, v in boundary.items()},
        "irreducible_bytes_mb": round(irreducible_bytes / 1e6, 2),
        "irreducible_detail_mb": {kk: round(v / 1e6, 3)
                                  for kk, v in irreducible.items()},
        "fusion_headroom_pct_of_traffic": round(
            100.0 * boundary_bytes / max(bytes_total, 1.0), 3),
        "best_case_step_saving_us": round(
            dt * 1e6 * boundary_bytes / max(bytes_total, 1.0), 3),
    }
    out["verdict"] = (
        "fuse" if out["fusion_headroom_pct_of_traffic"] > 10.0 else
        "closed-negative: whole-step fusion can only remove the "
        "boundary activations; at this shape they are "
        f"{out['fusion_headroom_pct_of_traffic']}% of the step's HBM "
        "traffic — the step is bound by weights/Adam and the S*N*K x-row "
        "broadcast, which fusion cannot remove"
    )
    print(json.dumps(out, indent=1))
    Path("runs").mkdir(exist_ok=True)
    Path("runs/mnist_fusion_probe.json").write_text(json.dumps(out, indent=1))
    print("wrote runs/mnist_fusion_probe.json")


if __name__ == "__main__":
    main()
