#!/usr/bin/env python
"""HW verification of combine_fused's in-kernel PRNG (eps=None, seed=...).

The interpreter has no lowering for the TPU PRNG primitives, so this path
cannot be CI-tested on CPU (same as the tinystep megakernel's RNG mode);
this script is its hardware contract, mirroring verify_decoder_bwd_tpu.py:

1. determinism: same seed → bit-identical z; different seed → different;
2. ε statistics: recover ε = L̃ᵀ(z − μ̃) from the kernel outputs using
   the XLA oracle's Cholesky — must be N(0,1) to Box–Muller tolerance;
3. gradient parity (THE critical check — the recompute backward must
   regenerate the forward's exact bits): grads of a z/log_resp/local/
   stats-dependent loss in seed mode must match the eps-injected kernel
   at eps = the recovered ε to float tolerance.

Run on TPU:  python benchmarks/verify_kernel_rng_tpu.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N, K, D, S = 300, 10, 4, 2  # padded n exercises the mask; 3 fwd tiles


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from svax.models import svae
    from svax.ops.combine_pallas import combine_fused
    from svax.pgm import gmm

    assert jax.default_backend() == "tpu", "HW verification needs the TPU"

    rng = np.random.default_rng(0)
    prior = gmm.make_prior(K, D)
    exp = gmm.expected_params(prior)
    pot_h = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    pot_p = jnp.asarray(rng.random((N, D)) + 0.5, jnp.float32)

    run_seed = jax.jit(lambda s: combine_fused(
        pot_h, pot_p, exp, None, S, seed=s))
    z1, lr1, mu1, loc1, st1 = run_seed(jnp.asarray([17], jnp.int32))
    z2, lr2, mu2, loc2, st2 = run_seed(jnp.asarray([17], jnp.int32))
    z3 = run_seed(jnp.asarray([18], jnp.int32))[0]
    det_same = bool(jnp.all(z1 == z2))
    det_diff = bool(jnp.any(z1 != z3))

    # ε recovery via the XLA oracle's Cholesky: z = μ̃ + L̃⁻ᵀε.
    post = svae.sin_combine(pot_h, pot_p, exp)
    eps_rec = jnp.einsum(
        "nkij,snkj->snki", jnp.swapaxes(post.prec_chol, -1, -2),
        z1 - post.mean[None], precision=jax.lax.Precision.HIGHEST,
    )
    e = np.asarray(eps_rec).ravel()
    stats_ok = bool(abs(e.mean()) < 0.02 and abs(e.std() - 1.0) < 0.02)

    # Gradient parity: seed mode vs eps-injected kernel at the recovered ε.
    cot = jnp.asarray(rng.standard_normal(z1.shape), jnp.float32)

    def loss_seed(ph, pp):
        z, lr, mu, loc, st = combine_fused(
            ph, pp, exp, None, S, seed=jnp.asarray([17], jnp.int32))
        return (jnp.sum(z * cot) + jnp.sum(lr) + jnp.sum(loc)
                + jnp.sum(st.counts) + jnp.sum(st.mean_stat))

    def loss_eps(ph, pp):
        z, lr, mu, loc, st = combine_fused(ph, pp, exp, eps_rec, S)
        return (jnp.sum(z * cot) + jnp.sum(lr) + jnp.sum(loc)
                + jnp.sum(st.counts) + jnp.sum(st.mean_stat))

    gs = jax.jit(jax.grad(loss_seed, argnums=(0, 1)))(pot_h, pot_p)
    ge = jax.jit(jax.grad(loss_eps, argnums=(0, 1)))(pot_h, pot_p)
    rel = [float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-30))
           for a, b in zip(gs, ge)]
    # Forward value parity for the ε-independent outputs:
    fwd_rel = float(jnp.max(jnp.abs(lr1 - post.log_resp)))

    out = {
        "deterministic_same_seed": det_same,
        "differs_across_seeds": det_diff,
        "recovered_eps_mean": round(float(e.mean()), 5),
        "recovered_eps_std": round(float(e.std()), 5),
        "eps_stats_ok": stats_ok,
        "grad_rel_err_pot_h": rel[0],
        "grad_rel_err_pot_p": rel[1],
        "log_resp_max_abs_err_vs_oracle": fwd_rel,
        "ok": det_same and det_diff and stats_ok
        and max(rel) < 5e-5 and fwd_rel < 1e-4,
    }
    print(json.dumps(out), flush=True)
    assert out["ok"], out


if __name__ == "__main__":
    main()
