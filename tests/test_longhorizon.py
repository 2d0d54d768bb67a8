"""Long-horizon f32 quality pin for the full SVAE loop (VERDICT r1 #5).

The 12-step golden and the CVI-only parity tests can't catch a precision
regression that only accumulates over thousands of Adam+CVI steps. Per-step
comparison through Adam is hopeless (sign-like early dynamics amplify float
noise chaotically, and jax.random draws different values per dtype), so
this pins CONVERGED QUALITY instead: matched-seed, matched-init f32 and
f64 full pinwheel runs (2000 steps, scan-chunked) must land at final
test-ELBO-per-point within a band. Measured baseline deviation was ~1.1%
(MC-noise stochasticity); a silent f32 precision bug in the conjugate path
moves this by far more than the 4% band.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import make_pinwheel_data
from svax.models.svae import SvaeConfig
from svax.pgm import gmm
from svax.train import svae_step
from svax.train.loop import make_scan_runner

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)

STEPS = 2000
CHUNK = 500


def _run(dtype, x_np, xt_np, state64, prior64, config, opt):
    def cast(t):
        return jax.tree.map(
            lambda a: a.astype(dtype)
            if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            t,
        )

    prior, state = cast(prior64), cast(state64)
    x, xt = jnp.asarray(x_np, dtype), jnp.asarray(xt_np, dtype)
    step = svae_step.make_train_step(config, prior, opt, rho=0.05)
    runner = make_scan_runner(step, CHUNK)
    k = jax.random.PRNGKey(99)
    first_elbo = None
    for _ in range(STEPS // CHUNK):
        k, kc = jax.random.split(k)
        state, metrics = runner(state, x, kc)
        if first_elbo is None:
            first_elbo = float(metrics["elbo"][0])
    ev = jax.jit(svae_step.make_eval_fn(config, prior))(state, xt, k)
    return float(ev["elbo_per_point"]), first_elbo, float(metrics["elbo"][-1])


def test_longhorizon_f32_quality_matches_f64():
    x_np = make_pinwheel_data(num_classes=4, num_per_class=40, seed=21)
    xt_np = make_pinwheel_data(num_classes=4, num_per_class=25, seed=22)
    n = x_np.shape[0]
    config = SvaeConfig(latent_dim=2, num_components=6, num_samples=1, num_total=n)
    prior64 = gmm.make_prior(6, 2, dtype=jnp.float64)
    opt = optax.adam(1e-3)
    # Initialize ONCE in f64 and cast, so both runs start at the same model.
    state64 = svae_step.init_state(
        jax.random.PRNGKey(5), 2, config, prior64, opt, (16,), (16,),
        data=jnp.asarray(x_np),
    )

    q32, first32, last32 = _run(jnp.float32, x_np, xt_np, state64, prior64, config, opt)
    q64, first64, last64 = _run(jnp.float64, x_np, xt_np, state64, prior64, config, opt)

    # Both runs actually trained (ELBO improved a lot over the horizon).
    assert last32 > first32 + 0.5 * abs(first32)
    assert last64 > first64 + 0.5 * abs(first64)
    assert np.isfinite(q32) and np.isfinite(q64)

    rel = abs(q32 - q64) / abs(q64)
    assert rel < 0.04, (
        f"f32 converged quality {q32:.4f} vs f64 {q64:.4f} "
        f"(rel dev {rel:.3%} exceeds the 4% band)"
    )
