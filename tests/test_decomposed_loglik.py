"""Decomposed Bernoulli log-lik equals the broadcast form (values + grads)."""

import jax
import jax.numpy as jnp
import numpy as np

from svax.nets import mlp as nets


def test_decomposed_matches_broadcast(rng, key):
    s, n, k, d, dim = 2, 6, 4, 3, 11
    params = nets.decoder_init(key, d, (8,), dim, "bernoulli", dtype=jnp.float64)
    z = jnp.asarray(rng.standard_normal((s, n, k, d)))
    x = jnp.asarray((rng.uniform(size=(n, dim)) > 0.5).astype(np.float64))

    want = nets.log_likelihood(params, z, x[None, :, None, :], "bernoulli")
    got = nets.bernoulli_loglik_decomposed(params, z, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)

    def loss_b(p):
        return jnp.sum(nets.log_likelihood(p, z, x[None, :, None, :], "bernoulli"))

    def loss_d(p):
        return jnp.sum(nets.bernoulli_loglik_decomposed(p, z, x))

    g1 = jax.grad(loss_b)(params)
    g2 = jax.grad(loss_d)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)
