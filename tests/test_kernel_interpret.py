"""Interpret-mode execution of the REAL Pallas kernel bodies (SURVEY.md §5).

The CPU suite previously only validated the jnp twins against themselves
(the public entry points fall back off-TPU), so a Mosaic-facing regression
in the kernel bodies would pass CI. These tests run the actual kernel
programs — slot layouts, N-tile grid accumulation, padding and masking —
through ``pl.pallas_call(..., interpret=True)`` and assert against the jnp
twins at the awkward shapes: N not a tile multiple, odd K, d=2 vs d=10,
non-128 feature dims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svax.ops import decoder_pallas, estep_pallas
from svax.pgm import gmm

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _gmm_setup(seed, n, k, d):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    prior = gmm.make_prior(k, d, dtype=jnp.float64)
    nat = gmm.init_variational(jax.random.PRNGKey(seed), prior, x)
    return x, gmm.expected_params(nat)


@pytest.mark.parametrize(
    "n,k,d,tile_n",
    [
        (100, 7, 2, 512),  # N < one tile, odd K, pinwheel dim
        (300, 5, 6, 128),  # multi-tile grid: accumulation across 3 tiles
        (200, 9, 10, 128),  # d=10 (the bigk latent dim), partial last tile
    ],
)
def test_estep_kernel_interpret_vs_twin(n, k, d, tile_n):
    x, exp = _gmm_setup(0, n, k, d)
    want, ev_want = estep_pallas.e_step_stats_reference(x, exp, scale=2.5)
    got, ev = estep_pallas.e_step_stats_fused(
        x, exp, scale=2.5, tile_n=tile_n, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_want), rtol=2e-5)
    # f32 stats accumulate in a different (tile-grid) order than the twin's
    # single dot, so allow one part in 10^3 of order noise at d=10.
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )


def test_estep_kernel_interpret_masks_padding():
    """Padded rows (N→tile) and components (K→8) contribute exactly zero."""
    x, exp = _gmm_setup(1, 33, 3, 2)  # n_pad=128, k_pad=8: heavy padding
    got, ev = estep_pallas.e_step_stats_fused(x, exp, interpret=True)
    want, _ = estep_pallas.e_step_stats_reference(x, exp)
    # Counts sum to N exactly when no padding leaks into the stats matmul.
    np.testing.assert_allclose(float(jnp.sum(got.counts)), 33.0, rtol=1e-5)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
    assert ev.shape == (33,)


def _decoder_setup(seed, n, r, dh, d):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((n, r, dh)), dtype=jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((dh, d)), dtype=jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((d,)), dtype=jnp.float32)
    x = jnp.asarray(rng.integers(0, 2, size=(n, d)), dtype=jnp.float32)
    return h, w, b, x


@pytest.mark.parametrize("n,r,dh,d,tile_m", [(5, 3, 20, 33, 8), (4, 4, 16, 784, 16)])
def test_decoder_rowsum_kernel_interpret_forward(n, r, dh, d, tile_m):
    h, w, b, x = _decoder_setup(0, n, r, dh, d)
    want = decoder_pallas.bernoulli_loglik_reference(h, w, b, x)
    got = decoder_pallas.fused_bernoulli_loglik(
        h, w, b, x, tile_m=tile_m, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_decoder_rowsum_kernel_interpret_gradients():
    """The custom-VJP bwd kernel (multi-tile W̄/b̄ accumulation) vs autodiff."""
    h, w, b, x = _decoder_setup(1, 5, 3, 20, 33)  # m=15 → 2 tiles of 8

    def loss_kernel(h, w, b):
        out = decoder_pallas.fused_bernoulli_loglik(
            h, w, b, x, tile_m=8, interpret=True
        )
        return jnp.sum(jnp.sin(out))  # non-uniform cotangents

    def loss_twin(h, w, b):
        return jnp.sum(jnp.sin(decoder_pallas.bernoulli_loglik_reference(h, w, b, x)))

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(h, w, b)
    want = jax.grad(loss_twin, argnums=(0, 1, 2))(h, w, b)
    for g, t in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(t), rtol=5e-5, atol=5e-5)


def test_rowsum_leading_axes_and_mlp_fused_path():
    """The public rowsum wrapper handles (S,N,K,Dh) leading axes, and the
    mlp fused route (kernel in interpret mode) matches the XLA formula."""
    from svax.nets import mlp as nets

    rng = np.random.default_rng(5)
    s_, n, k, dh, d = 2, 3, 4, 12, 17
    h = jnp.asarray(rng.standard_normal((s_, n, k, dh)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((dh, d)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((d,)), jnp.float32)
    got = decoder_pallas.rowsum_logsig_neg(h, w, b, tile_m=8, interpret=True)
    want = jnp.sum(jax.nn.log_sigmoid(-(h @ w + b)), axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # Full decomposed path: patch the backend gate so the fused branch runs
    # under the interpreter on CPU.
    params = [
        {"w": jnp.asarray(rng.standard_normal((5, dh)), jnp.float32) * 0.3,
         "b": jnp.zeros((dh,), jnp.float32)},
        {"w": w, "b": b},
    ]
    z = jnp.asarray(rng.standard_normal((s_, n, k, 5)), jnp.float32)
    x = jnp.asarray(rng.integers(0, 2, (n, d)), jnp.float32)
    want_ll = nets.bernoulli_loglik_decomposed(params, z, x, fused=False)
    import unittest.mock as mock

    orig_fwd = decoder_pallas._rowsum_fwd_call
    with mock.patch("jax.default_backend", return_value="tpu"), mock.patch(
        "svax.ops.decoder_pallas._rowsum_fwd_call",
        lambda *a, **kw: orig_fwd(*a, **{**kw, "interpret": True}),
    ):
        got_ll = nets.bernoulli_loglik_decomposed(params, z, x, fused=True)
    np.testing.assert_allclose(
        np.asarray(got_ll), np.asarray(want_ll), rtol=2e-4, atol=2e-4
    )
