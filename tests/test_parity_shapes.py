"""f32-vs-f64 parity at the Auto and MNIST config geometries (VERDICT r1 #4).

BASELINE demands ELBO-trajectory parity ≤1e-4 relative on pinwheel AND Auto
(SURVEY.md §7); test_parity.py pins pinwheel shapes only (d=2, K≤8). These
tests demonstrate the same bar on the conjugate (CVI) path at the other
BASELINE config geometries, where the NIW/Cholesky conditioning differs:

* Auto shape  — d_in=7 standardized features, latent d=4, MLP 100-100,
  Gaussian likelihood (configs auto-svae);
* MNIST shape — d_in=784 binarized pixels, latent d=8, MLP 200-200,
  Bernoulli likelihood (configs mnist-svae).

Seeded golden trajectories at both shapes (regenerable via
tests/regen_golden.py) detect unintended math changes at these geometries.
"""

import pytest
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from svax.models import svae
from svax.models.svae import SvaeConfig
from svax.pgm import gmm, natgrad

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _cast(tree, dt):
    return jax.tree.map(lambda a: a.astype(dt), tree)


def _make_data(shape_name: str):
    rng = np.random.default_rng(42)
    if shape_name == "auto":
        # Standardized continuous features, like the UCI Auto table.
        x = rng.standard_normal((64, 7))
        x = (x - x.mean(0)) / x.std(0)
        return x
    # Binarized structured patterns, like thresholded MNIST.
    base = rng.random((40, 784))
    return (base > 0.7).astype(np.float64)


def _shape_setup(shape_name: str):
    if shape_name == "auto":
        x_np = _make_data("auto")
        k, d, s = 10, 4, 2
        hidden = (100, 100)
        likelihood = "gaussian"
    else:
        x_np = _make_data("mnist")
        k, d, s = 10, 8, 1
        hidden = (200, 200)
        likelihood = "bernoulli"
    n, d_in = x_np.shape
    config = SvaeConfig(
        latent_dim=d,
        num_components=k,
        num_samples=s,
        likelihood=likelihood,
        num_total=n,
    )
    key = jax.random.PRNGKey(13)
    eps_np = np.random.default_rng(3).standard_normal((s, n, k, d))
    prior64 = gmm.make_prior(k, d, dtype=jnp.float64)
    nn64 = svae.init_params(key, d_in, config, hidden, hidden, dtype=jnp.float64)
    pgm64 = gmm.init_variational(key, prior64, None)
    return x_np, eps_np, config, key, prior64, nn64, pgm64


def _cvi_trajectory(shape_name: str, dtype, steps: int = 15, rho: float = 0.2):
    """CVI-only trajectory (fixed NN params — the conjugate parity path)."""
    x_np, eps_np, config, key, prior64, nn64, pgm64 = _shape_setup(shape_name)
    x = jnp.asarray(x_np, dtype=dtype)
    eps = jnp.asarray(eps_np, dtype=dtype)
    prior, nn, pgm_nat = _cast(prior64, dtype), _cast(nn64, dtype), _cast(pgm64, dtype)

    @jax.jit
    def one(pgm_nat):
        out = svae.forward(nn, pgm_nat, prior, x, key, config, eps=eps)
        new = natgrad.cvi_update(pgm_nat, prior, gmm.stats_to_nat(out.suff_stats), rho)
        return new, out.elbo

    elbos = []
    for _ in range(steps):
        pgm_nat, e = one(pgm_nat)
        elbos.append(float(e))
    return np.asarray(elbos)


def test_auto_shape_f32_matches_f64_1e4():
    e32 = _cvi_trajectory("auto", jnp.float32)
    e64 = _cvi_trajectory("auto", jnp.float64)
    rel = np.abs(e32 - e64) / np.abs(e64)
    assert rel.max() < 1e-4, f"max rel dev {rel.max():.2e} at step {rel.argmax()}"


def test_mnist_shape_f32_matches_f64_1e4():
    e32 = _cvi_trajectory("mnist", jnp.float32)
    e64 = _cvi_trajectory("mnist", jnp.float64)
    rel = np.abs(e32 - e64) / np.abs(e64)
    assert rel.max() < 1e-4, f"max rel dev {rel.max():.2e} at step {rel.argmax()}"


def _golden_check(shape_name: str):
    golden_path = Path(__file__).parent / "golden" / f"svae_{shape_name}_f64.json"
    got = _cvi_trajectory(shape_name, jnp.float64)
    if not golden_path.exists():
        golden_path.parent.mkdir(exist_ok=True)
        golden_path.write_text(json.dumps([round(v, 6) for v in got.tolist()]))
        return
    want = np.asarray(json.loads(golden_path.read_text()))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_golden_auto_shape_trajectory():
    _golden_check("auto")


def test_golden_mnist_shape_trajectory():
    _golden_check("mnist")
