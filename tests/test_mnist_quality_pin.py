"""Reduced-scale quality regression pin for the Bernoulli/high-d path.

The mnist-svae / bigk configs had throughput coverage but no quality
gate: a kernel-stack or math regression that degraded the Bernoulli
decoder path could pass every test (VERDICT r3 item 3). This pin trains
a scaled-down mnist-svae on the deterministic synthetic surrogate with
the shipped anti-collapse recipe (svax/train/warmup.py: rho=0 warmup +
k-means++ reseed, the mnist-svae/bigk-dp config default) and asserts
cluster purity and held-out ELBO floors.

Thresholds carry wide margins below the measured values (purity 1.0,
test ELBO/pt −238 at this exact config, CPU f64, 2026-08-19). The
failure modes they guard: a broken combine/decoder/CVI path leaves the
ELBO near init (−550); the pre-warmup collapse pathology reaches the
same ELBO plateau (−238) but purity 0.117 with 1/10 components — purity
is the discriminating assert, the ELBO floor catches gross breakage.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.data import load_mnist
from svax.models import evaluation, svae as svae_mod
from svax.models.svae import SvaeConfig
from svax.nets import mlp as nets
from svax.pgm import gmm
from svax.train import svae_step
from svax.train.loop import make_minibatch_scan_runner
from svax.train.warmup import vae_warmup_reseed

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def test_bernoulli_path_quality_pin():
    x_train, x_test, meta, _, y_test = load_mnist(
        seed=0, max_train=600, return_labels=True
    )
    assert meta["synthetic"] is True  # the pin is against the surrogate
    x = jnp.asarray(x_train, jnp.float32)
    xt = jnp.asarray(x_test[:400], jnp.float32)
    yt = np.asarray(y_test[:400])
    n = x.shape[0]

    config = SvaeConfig(latent_dim=8, num_components=10, num_samples=1,
                        likelihood="bernoulli", num_total=n)
    prior = gmm.make_prior(10, 8, alpha=1.0, kappa=0.05)
    opt = optax.adam(1e-3)
    rho = lambda t: 0.1 / (1.0 + 0.001 * t.astype(jnp.float32))  # noqa: E731
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(key, x.shape[1], config, prior, opt,
                                 (64, 64), (64, 64), data=x)

    eval_fn = jax.jit(svae_step.make_eval_fn(config, prior))
    ev0 = eval_fn(state, xt, jax.random.PRNGKey(99))

    # Phase 1+2: the shipped anti-collapse recipe.
    state, winfo = vae_warmup_reseed(
        state, x, config, prior, opt, jax.random.fold_in(key, 17),
        steps=800, batch_size=128,
    )
    assert winfo["seed_occupancy"] >= 8, winfo

    # Phase 3: joint SVAE training.
    step = svae_step.make_train_step(config, prior, opt, rho=rho)
    chunk, steps, batch = 100, 800, 128
    runner = make_minibatch_scan_runner(step, chunk)
    kk = key
    for c in range(steps // chunk):
        kk = jax.random.fold_in(kk, c)
        kb, kr = jax.random.split(kk)
        idx = jax.random.randint(kb, (chunk, batch), 0, n)
        state, mets = runner(state, x[idx], kr)

    ev = eval_fn(state, xt, jax.random.PRNGKey(99))
    test_elbo = float(ev["elbo_per_point"])
    assert test_elbo > float(ev0["elbo_per_point"]) + 100.0, (
        f"training barely moved the held-out ELBO: "
        f"{ev0['elbo_per_point']} -> {test_elbo}"
    )
    assert test_elbo > -280.0, f"test ELBO/pt regression: {test_elbo}"

    exp = gmm.expected_params(state.pgm_nat)
    pot_h, pot_p = nets.encoder_apply(state.nn_params["encoder"], xt)
    post = svae_mod.sin_combine(pot_h, pot_p, exp)
    resp = jnp.exp(post.log_resp)
    purity = evaluation.cluster_purity(resp, yt)
    ncomp = np.unique(np.asarray(jnp.argmax(post.log_resp, -1))).size
    assert ncomp >= 6, f"mixture collapse: only {ncomp}/10 components used"
    assert purity > 0.7, f"cluster purity regression: {purity}"
