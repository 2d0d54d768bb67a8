"""Fused Bernoulli MLP-decoder kernel: interpret-mode values + gradients.

The kernel's numerics are bf16 dots with f32 accumulation AND f32
activations between layers (slightly more precise than the XLA
compute_dtype=bfloat16 path, which keeps bf16 activations) — the oracle
here is an exact jnp mirror of those numerics; closeness to the XLA bf16
path is checked at bf16-noise tolerance.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from svax.models import svae
from svax.nets import mlp as nets
from svax.ops import decoder_mlp_pallas as dmp
from svax.pgm import gmm

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _mirror(params, z, x):
    bf, f32 = jnp.bfloat16, jnp.float32
    h1 = jnp.tanh(jnp.dot(z.astype(bf), params[0]["w"].astype(bf),
                          preferred_element_type=f32) + params[0]["b"])
    h2 = jnp.tanh(jnp.dot(h1.astype(bf), params[1]["w"].astype(bf),
                          preferred_element_type=f32) + params[1]["b"])
    o = jnp.dot(h2.astype(bf), params[2]["w"].astype(bf),
                preferred_element_type=f32) + params[2]["b"]
    rowsum = jnp.sum(jax.nn.log_sigmoid(-o), axis=-1)
    y = jnp.dot(x.astype(bf), params[2]["w"].astype(bf).T,
                preferred_element_type=f32)
    c = jnp.dot(x.astype(bf), params[2]["b"].astype(bf),
                preferred_element_type=f32)
    t = jnp.einsum("snkh,nh->snk", h2, y) + c[None, :, None]
    return t + rowsum


def _setup(s=2, n=40, k=5, d=3, dh=16, dd=24, seed=0):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    params = [jax.tree.map(lambda p: p.astype(jnp.float32), layer)
              for layer in nets.mlp_init(key, [d, dh, dh, dd])]
    z = jnp.asarray(rng.standard_normal((s, n, k, d)).astype(np.float32))
    x = jnp.asarray((rng.random((n, dd)) > 0.5).astype(np.float32))
    return params, z, x


def test_values_match_mirror():
    params, z, x = _setup()
    ll_f = dmp.bernoulli_mlp_loglik_fused(params, z, x, tile=128,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(ll_f), np.asarray(_mirror(params, z, x)),
                               rtol=1e-5, atol=1e-5)
    # Against the production XLA bf16 path: bf16-profile noise only.
    ll_x = nets.bernoulli_loglik_decomposed(params, z, x,
                                            compute_dtype=jnp.bfloat16)
    assert float(jnp.max(jnp.abs(ll_f - ll_x))) < 0.1


def test_gradients_match_mirror():
    params, z, x = _setup(seed=3)
    w = jnp.cos(jnp.arange(z.shape[0] * z.shape[1] * z.shape[2],
                           dtype=jnp.float32)).reshape(z.shape[:3])

    def lf(p, zz):
        return jnp.sum(w * dmp.bernoulli_mlp_loglik_fused(
            p, zz, x, tile=128, interpret=True))

    def lm(p, zz):
        return jnp.sum(w * _mirror(p, zz, x))

    (gp_f, gz_f) = jax.grad(lf, argnums=(0, 1))(params, z)
    (gp_m, gz_m) = jax.grad(lm, argnums=(0, 1))(params, z)
    # dz is elementwise-exact; dW differs only by f32 reduction order over
    # bf16-rounded products (scales with sqrt(rows)·eps_bf16).
    np.testing.assert_allclose(np.asarray(gz_f), np.asarray(gz_m),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp_f), jax.tree.leaves(gp_m)):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-3


def test_gradients_match_mirror_multitile():
    """n_pad > tile: the per-n-tile dy/dc accumulation path (round-2 bug).

    tile=128 with n=300 → 3 n-tiles, so the backward grid revisits the
    dW/db blocks across n-tiles and the dy/dc blocks across the inner
    (s,k) sweep. Interpret mode checks the index maps/accumulation logic;
    the hardware revisit-ordering contract is separately verified on a
    real chip by benchmarks/verify_decoder_bwd_tpu.py.
    """
    params, z, x = _setup(s=2, n=300, k=5, d=3, dh=16, dd=24, seed=7)
    w = jnp.cos(jnp.arange(z.shape[0] * z.shape[1] * z.shape[2],
                           dtype=jnp.float32)).reshape(z.shape[:3])

    def lf(p, zz):
        return jnp.sum(w * dmp.bernoulli_mlp_loglik_fused(
            p, zz, x, tile=128, interpret=True))

    def lm(p, zz):
        return jnp.sum(w * _mirror(p, zz, x))

    (gp_f, gz_f) = jax.grad(lf, argnums=(0, 1))(params, z)
    (gp_m, gz_m) = jax.grad(lm, argnums=(0, 1))(params, z)
    # At this size a handful of elements (4/9000 measured) land on bf16
    # rounding-boundary ties between the kernel's f32-activation profile
    # and the mirror, diverging by 1 ulp (~1e-3). Systematic accumulation
    # corruption would break whole tiles, so bound BOTH the worst case and
    # the mismatch count.
    err = np.abs(np.asarray(gz_f) - np.asarray(gz_m))
    assert float(err.max()) < 5e-3
    assert (err > 1e-5).mean() < 5e-3
    # dW noise grows ~sqrt(rows) (3000 here vs 400 in the small test;
    # 5.6e-3 measured). A missing/garbage tile contribution — what this
    # test exists to catch — is O(1) relative, so 2e-2 stays sharp.
    for a, b in zip(jax.tree.leaves(gp_f), jax.tree.leaves(gp_m)):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2


def test_forward_integration(monkeypatch):
    """svae.forward with fused_mlp_decoder ≈ the XLA bf16 path."""
    from svax.models.svae import SvaeConfig

    monkeypatch.setattr(svae, "_COMBINE_INTERPRET", True)
    n, k, d, s, d_in = 32, 4, 2, 2, 12
    rng = np.random.default_rng(5)
    x = jnp.asarray((rng.random((n, d_in)) > 0.5).astype(np.float32))
    config = SvaeConfig(latent_dim=d, num_components=k, num_samples=s,
                        likelihood="bernoulli", num_total=n,
                        nn_compute_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    prior = gmm.make_prior(k, d)
    f32 = lambda t: jax.tree.map(lambda p: p.astype(jnp.float32), t)  # noqa: E731
    nn = f32(svae.init_params(key, d_in, config, (16,), (16,)))
    nat = f32(gmm.init_variational(key, prior))
    prior = f32(prior)
    eps = jnp.asarray(rng.standard_normal((s, n, k, d)).astype(np.float32))

    out_x = svae.forward(nn, nat, prior, x, key, config, eps=eps)
    out_f = svae.forward(
        nn, nat, prior, x, key, config._replace(fused_mlp_decoder=True),
        eps=eps,
    )
    # recon differs only by the bf16 activation-precision profile.
    assert abs(float(out_f.recon - out_x.recon)) / abs(float(out_x.recon)) < 1e-2
    np.testing.assert_allclose(float(out_f.local_kl), float(out_x.local_kl),
                               rtol=1e-6)
    g = jax.grad(lambda p: -svae.forward(
        p, nat, prior, x, key, config._replace(fused_mlp_decoder=True),
        eps=eps).elbo)(nn)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat)))
