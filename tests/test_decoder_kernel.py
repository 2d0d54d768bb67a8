"""Fused decoder-likelihood kernel: twin vs nets composition + grad path."""

import jax
import jax.numpy as jnp
import numpy as np

from svax.nets import mlp as nets
from svax.ops import decoder_pallas as dk


def _setup(rng, n=6, r=5, dh=16, d=12):
    h = jnp.asarray(rng.standard_normal((n, r, dh)))
    w = jnp.asarray(rng.standard_normal((dh, d)) * 0.3)
    b = jnp.asarray(rng.standard_normal(d) * 0.1)
    x = jnp.asarray((rng.uniform(size=(n, d)) > 0.5).astype(np.float64))
    return h, w, b, x


def test_reference_matches_nets_composition(rng):
    h, w, b, x = _setup(rng)
    got = dk.bernoulli_loglik_reference(h, w, b, x)
    logits = jnp.einsum("nrh,hd->nrd", h, w) + b
    want = nets.bernoulli_loglik(x[:, None, :], logits)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


def test_fused_entry_cpu_fallback_and_grads(rng):
    h, w, b, x = _setup(rng)

    def loss_fused(h, w, b):
        return jnp.sum(dk.fused_bernoulli_loglik(h, w, b, x))

    def loss_ref(h, w, b):
        return jnp.sum(dk.bernoulli_loglik_reference(h, w, b, x))

    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(h, w, b)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-9, atol=1e-12)
