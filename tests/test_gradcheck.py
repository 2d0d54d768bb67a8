"""Finite-difference check of the SVAE ELBO gradient (SURVEY.md §8 #3).

The trickiest gradient path is through the responsibilities r̃ (they depend
on the encoder via the combine's log-normalizers). With fixed noise the
ELBO is deterministic, so central differences on individual encoder and
decoder parameters must match jax.grad to high accuracy in float64.
"""

import jax
import jax.numpy as jnp
import numpy as np

from svax.data import make_pinwheel_data
from svax.models import svae
from svax.models.svae import SvaeConfig
from svax.pgm import gmm


def test_elbo_gradient_matches_finite_differences(key):
    x = jnp.asarray(
        make_pinwheel_data(num_classes=3, num_per_class=8, seed=0), dtype=jnp.float64
    )
    n = x.shape[0]
    k, d, s = 3, 2, 2
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=s, num_total=n)
    prior = gmm.make_prior(k, d, dtype=jnp.float64)
    nn = svae.init_params(key, 2, config, (6,), (6,), dtype=jnp.float64)
    nat = gmm.init_variational(key, prior, x)
    eps = jnp.asarray(
        np.random.default_rng(0).standard_normal((s, n, k, d)), dtype=jnp.float64
    )

    @jax.jit
    def elbo_fn(nn):
        return svae.forward(nn, nat, prior, x, key, config, eps=eps).elbo

    grads = jax.grad(elbo_fn)(nn)

    rng = np.random.default_rng(1)
    h = 1e-6
    checked = 0
    for part in ("encoder", "decoder"):
        for layer_idx, layer in enumerate(nn[part]):
            for name in ("w", "b"):
                arr = np.asarray(layer[name])
                # Probe two random coordinates per parameter tensor.
                for _ in range(2):
                    idx = tuple(rng.integers(0, s_) for s_ in arr.shape)

                    def perturbed(delta):
                        new = jax.tree.map(lambda a: a, nn)  # shallow copy tree
                        new[part] = [dict(l) for l in nn[part]]
                        new[part][layer_idx][name] = (
                            jnp.asarray(arr).at[idx].add(delta)
                        )
                        return float(elbo_fn(new))

                    fd = (perturbed(h) - perturbed(-h)) / (2 * h)
                    an = float(np.asarray(grads[part][layer_idx][name])[idx])
                    np.testing.assert_allclose(
                        an, fd, rtol=2e-4, atol=1e-5,
                        err_msg=f"{part}[{layer_idx}].{name}{idx}",
                    )
                    checked += 1
    assert checked >= 16
