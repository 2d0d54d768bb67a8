"""bf16 decoder-compute knob (SvaeConfig.nn_compute_dtype).

The bandwidth play for the memory-bound big-K step runs the decoder body
in bfloat16 with f32 accumulation of every (n, k) reduction. These tests
pin (a) the ELBO stays close to the f32 path at matched noise, (b) the
gradients stay finite and point the same way, (c) both likelihood heads
and the SMM variant accept the knob.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svax.models import svae, svae_smm
from svax.models.svae import SvaeConfig
from svax.pgm import gmm

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _setup(likelihood, d_in, dof=0.0):
    k, d_lat, n = 5, 3, 32
    config = SvaeConfig(
        latent_dim=d_lat,
        num_components=k,
        num_samples=2,
        likelihood=likelihood,
        num_total=n,
        dof=dof,
    )
    key = jax.random.PRNGKey(1)
    prior = gmm.make_prior(k, d_lat)
    nn_params = jax.tree.map(
        lambda p: p.astype(jnp.float32), svae.init_params(key, d_in, config)
    )
    pgm_nat = jax.tree.map(lambda p: p.astype(jnp.float32), gmm.init_variational(key, prior))
    prior32 = jax.tree.map(lambda p: p.astype(jnp.float32), prior)
    rng = np.random.default_rng(0)
    if likelihood == "bernoulli":
        x = jnp.asarray((rng.random((n, d_in)) > 0.5).astype(np.float32))
    else:
        x = jnp.asarray(rng.standard_normal((n, d_in)).astype(np.float32))
    eps = jnp.asarray(
        rng.standard_normal((config.num_samples, n, k, d_lat)).astype(np.float32)
    )
    return config, prior32, nn_params, pgm_nat, x, key, eps


@pytest.mark.parametrize("likelihood,d_in", [("bernoulli", 12), ("gaussian", 4)])
def test_bf16_elbo_close_to_f32(likelihood, d_in):
    config, prior, nn, nat, x, key, eps = _setup(likelihood, d_in)
    out32 = svae.forward(nn, nat, prior, x, key, config, eps=eps)
    out16 = svae.forward(
        nn, nat, prior, x, key, config._replace(nn_compute_dtype="bfloat16"), eps=eps
    )
    assert jnp.isfinite(out16.elbo)
    # bf16 elementwise storage → ~1e-2 relative on the recon term at
    # matched noise; everything PGM-side is untouched (exact).
    rel = abs(float(out16.elbo - out32.elbo)) / abs(float(out32.elbo))
    assert rel < 2e-2, rel
    np.testing.assert_allclose(
        np.asarray(out16.local_kl), np.asarray(out32.local_kl), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out16.suff_stats.counts),
        np.asarray(out32.suff_stats.counts),
        rtol=1e-6,
    )


def test_bf16_gradients_finite_and_aligned():
    config, prior, nn, nat, x, key, eps = _setup("bernoulli", 12)

    def loss(nn_params, dtype):
        return -svae.forward(
            nn_params, nat, prior, x, key,
            config._replace(nn_compute_dtype=dtype), eps=eps,
        ).elbo

    g32 = jax.grad(lambda p: loss(p, "float32"))(nn)
    g16 = jax.grad(lambda p: loss(p, "bfloat16"))(nn)
    flat32, _ = jax.flatten_util.ravel_pytree(g32)
    flat16, _ = jax.flatten_util.ravel_pytree(g16)
    assert flat16.dtype == flat32.dtype  # grads come back in the param dtype
    assert bool(jnp.all(jnp.isfinite(flat16)))
    cos = float(
        jnp.vdot(flat32, flat16)
        / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16))
    )
    assert cos > 0.99, cos


def test_bf16_smm_forward():
    config, prior, nn, nat, x, key, eps = _setup("bernoulli", 12, dof=4.0)
    out = svae_smm.forward(
        nn, nat, prior, x, key, config._replace(nn_compute_dtype="bfloat16"), eps=eps
    )
    assert jnp.isfinite(out.elbo)
