"""Serving layer: bundle round-trip, bucketed batching, endpoint sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from svax import serve
from svax.data import make_pinwheel_data
from svax.pgm import gmm
from svax.train import svae_step

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


def _trained_state(spec, steps=30, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jnp.asarray(make_pinwheel_data(num_per_class=20, seed=seed), jnp.float32)
    config = spec.to_config()._replace(num_total=x.shape[0])
    prior = spec.make_prior()
    opt = optax.adam(1e-3)
    state = svae_step.init_state(
        key, spec.input_dim, config, prior, opt,
        spec.encoder_hidden, spec.decoder_hidden, data=x,
    )
    model = None
    if spec.dof > 0.0:
        from svax.models import svae_smm as model  # noqa: F811
    kwargs = {} if model is None else {"model": model}
    step = jax.jit(svae_step.make_train_step(config, prior, opt, rho=0.1, **kwargs))
    for i in range(steps):
        state, _ = step(state, x, jax.random.fold_in(key, i))
    return state, x


@pytest.fixture(scope="module")
def spec():
    return serve.ModelSpec(
        input_dim=2, latent_dim=2, num_components=4, likelihood="gaussian",
        encoder_hidden=(16,), decoder_hidden=(16,), num_samples=2,
        num_total=100,
    )


@pytest.fixture(scope="module")
def server(spec, tmp_path_factory):
    state, _ = _trained_state(spec)
    path = tmp_path_factory.mktemp("bundle")
    serve.save_bundle(path, state, spec)
    return serve.load_bundle(path, buckets=(8, 32))


def test_bundle_roundtrip_no_flags(server, spec):
    # The server reconstructed purely from disk matches the spec.
    assert server.spec == spec
    x = make_pinwheel_data(num_per_class=5, seed=1)
    out = server.encode(x)
    assert out["z_mean"].shape == (25, spec.latent_dim)
    assert out["responsibilities"].shape == (25, spec.num_components)
    np.testing.assert_allclose(out["responsibilities"].sum(-1), 1.0, rtol=1e-5)


def test_padding_is_invisible(server):
    """A request of odd size must equal the same rows inside a full bucket."""
    x = make_pinwheel_data(num_per_class=8, seed=2)  # 40 rows > bucket 32
    full = server.encode(x)
    small = server.encode(x[:5])  # padded 5 → 8
    np.testing.assert_allclose(small["z_mean"], full["z_mean"][:5], rtol=1e-5)
    np.testing.assert_array_equal(small["component"], full["component"][:5])


def test_score_and_reconstruct(server):
    x = make_pinwheel_data(num_per_class=3, seed=3)
    s = server.score(x, num_samples=20)
    assert s.shape == (15,) and np.all(np.isfinite(s))
    r = server.reconstruct(x)
    assert r.shape == x.shape and np.all(np.isfinite(r))


def test_impute(server):
    x = make_pinwheel_data(num_per_class=5, seed=2).astype(np.float32)
    mask = np.ones_like(x)
    mask[:, 1] = 0.0  # second coordinate missing everywhere
    x_nan = x.copy()
    x_nan[:, 1] = np.nan  # placeholder values must not leak into the fill
    out = server.impute(x_nan, mask, num_iters=8)
    assert out.shape == x.shape and np.all(np.isfinite(out))
    # Observed coordinates pass through bit-exactly.
    np.testing.assert_array_equal(out[:, 0], x[:, 0])
    # The fill actually moved off the zero initialisation.
    assert np.any(np.abs(out[:, 1]) > 1e-6)
    # More iterations ≈ the same fixed point (posterior-mean iteration
    # converges on this smooth toy model).
    out2 = server.impute(x_nan, mask, num_iters=12)
    np.testing.assert_allclose(out2, out, atol=1e-3)
    # All-observed mask is the identity.
    np.testing.assert_array_equal(server.impute(x, np.ones_like(x)), x)
    # A fractional mask binarizes to 'observed' (ADVICE r4): 0.5
    # everywhere is the identity too, not a placeholder/recon blend.
    np.testing.assert_array_equal(
        server.impute(x, np.full_like(x, 0.5)), x
    )


def test_impute_map_mode(server):
    """mode='map' (decode the MAP component instead of the mixture mean,
    round 5) honors the same contract: finite, observed passthrough,
    identity on all-observed; invalid modes raise."""
    x = make_pinwheel_data(num_per_class=5, seed=4).astype(np.float32)
    mask = np.ones_like(x)
    mask[:, 0] = 0.0
    out = server.impute(x, mask, num_iters=6, mode="map")
    assert out.shape == x.shape and np.all(np.isfinite(out))
    np.testing.assert_array_equal(out[:, 1], x[:, 1])
    np.testing.assert_array_equal(
        server.impute(x, np.ones_like(x), mode="map"), x
    )
    with pytest.raises(ValueError, match="mode"):
        server.impute(x, mask, mode="argmax")


def test_exported_impute_map_mode(server, tmp_path):
    """An export with impute_mode='map' records the rule in its manifest
    and reproduces the live map-mode endpoint exactly."""
    serve.export_serving(server, tmp_path / "map_exp", buckets=(8, 32),
                         score_samples=5, impute_iters=6,
                         impute_mode="map")
    exp = serve.load_exported(tmp_path / "map_exp")
    assert exp.impute_mode == "map"
    x = make_pinwheel_data(num_per_class=5, seed=4).astype(np.float32)
    mask = np.ones_like(x)
    mask[:, 0] = 0.0
    np.testing.assert_allclose(
        exp.impute(x, mask),
        server.impute(x, mask, num_iters=6, mode="map"),
        rtol=1e-6, atol=1e-6,
    )


def test_generate(server):
    x, z, labels = server.generate(12, key=jax.random.PRNGKey(4))
    assert x.shape == (12, 2) and z.shape == (12, 2) and labels.shape == (12,)
    assert labels.min() >= 0 and labels.max() < server.spec.num_components


def test_missing_state_raises(tmp_path, spec):
    import dataclasses
    import json

    path = tmp_path / "empty"
    path.mkdir()
    payload = dataclasses.asdict(spec)
    payload["encoder_hidden"] = list(spec.encoder_hidden)
    payload["decoder_hidden"] = list(spec.decoder_hidden)
    (path / "spec.json").write_text(json.dumps(payload))
    with pytest.raises(FileNotFoundError):
        serve.load_bundle(path)


def test_smm_server(tmp_path):
    spec = serve.ModelSpec(
        input_dim=2, latent_dim=2, num_components=3, likelihood="gaussian",
        encoder_hidden=(8,), decoder_hidden=(8,), dof=4.0, num_total=100,
    )
    state, x = _trained_state(spec, steps=10, seed=1)
    serve.save_bundle(tmp_path / "smm", state, spec)
    server = serve.load_bundle(tmp_path / "smm", buckets=(16,))
    out = server.encode(np.asarray(x)[:6])
    assert np.all(np.isfinite(out["z_mean"]))
    s = server.score(np.asarray(x)[:6], num_samples=10)
    assert np.all(np.isfinite(s))


def test_full_head_server(tmp_path):
    """Bundle round-trip + AOT export for encoder_head='full' (round 4):
    the spec field must survive the disk round-trip, and the rebuilt
    posterior must consume the (N, d, d) potential."""
    spec = serve.ModelSpec(
        input_dim=2, latent_dim=2, num_components=3, likelihood="gaussian",
        encoder_hidden=(8,), decoder_hidden=(8,), num_total=100,
        encoder_head="full",
    )
    state, x = _trained_state(spec, steps=10, seed=2)
    serve.save_bundle(tmp_path / "full", state, spec)
    server = serve.load_bundle(tmp_path / "full", buckets=(16,))
    assert server.spec.encoder_head == "full"
    out = server.encode(np.asarray(x)[:6])
    assert np.all(np.isfinite(out["z_mean"]))
    s = server.score(np.asarray(x)[:6], num_samples=10)
    assert np.all(np.isfinite(s))
    serve.export_serving(server, tmp_path / "full_exp", score_samples=10)
    exp = serve.load_exported(tmp_path / "full_exp")
    np.testing.assert_allclose(
        np.asarray(exp.encode(np.asarray(x)[:6])["z_mean"]),
        np.asarray(out["z_mean"]), rtol=1e-6,
    )


@pytest.fixture(scope="module")
def exported(server, tmp_path_factory):
    path = tmp_path_factory.mktemp("exports")
    manifest = serve.export_serving(server, path, score_samples=20)
    assert set(manifest["artifacts"]) == {
        "encode", "reconstruct", "score", "impute"
    }
    return serve.load_exported(path)


def test_exported_matches_live_server(server, exported):
    """The AOT StableHLO artifacts reproduce the jit server exactly —
    weights are baked into the export, nothing is re-traced."""
    x = make_pinwheel_data(num_per_class=5, seed=6)
    live = server.encode(x)
    aot = exported.encode(x)
    np.testing.assert_allclose(aot["z_mean"], live["z_mean"], rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_array_equal(aot["component"], live["component"])
    np.testing.assert_allclose(
        exported.reconstruct(x), server.reconstruct(x), rtol=1e-6, atol=1e-6
    )
    # score: same seed → identical IW estimate (the artifact builds the
    # PRNG key from the int32 seed input).
    s_live = server.score(x, key=jax.random.PRNGKey(7), num_samples=20)
    s_aot = exported.score(x, seed=7)
    assert s_aot.shape == s_live.shape and np.all(np.isfinite(s_aot))
    # impute: the artifact (fixed manifest iteration count) matches the
    # live endpoint at the same num_iters.
    mask = np.ones_like(x, dtype=np.float32)
    mask[::2, 0] = 0.0
    np.testing.assert_allclose(
        exported.impute(x, mask),
        server.impute(x, mask, num_iters=exported.impute_iters),
        rtol=1e-6, atol=1e-6,
    )


def test_exported_bucket_contract(exported):
    """Padding/chunking behave identically through the artifact tier."""
    x = make_pinwheel_data(num_per_class=8, seed=8)  # 40 rows > bucket 32
    full = exported.encode(x)
    small = exported.encode(x[:5])
    np.testing.assert_allclose(small["z_mean"], full["z_mean"][:5],
                               rtol=1e-5, atol=1e-6)
    assert exported.cluster(x).shape == (40,)


def test_exported_is_self_contained(server, exported, tmp_path):
    """The artifact directory alone (manifest + .stablehlo files) serves —
    no spec.json, no orbax state."""
    import os

    path = tmp_path / "solo"
    serve.export_serving(server, path, buckets=(8,), score_samples=5)
    names = sorted(os.listdir(path))
    assert "exports.json" in names
    assert all(n.endswith(".stablehlo") or n == "exports.json" for n in names)
    solo = serve.load_exported(path)
    x = make_pinwheel_data(num_per_class=2, seed=9)
    out = solo.encode(x)
    assert out["z_mean"].shape == (10, 2)
    assert np.all(np.isfinite(solo.score(x, seed=1)))


def test_exported_smm_server(tmp_path):
    """The Student-t-prior server exports too (u–z rounds trace under
    jax.export) and the artifact reproduces it."""
    spec = serve.ModelSpec(
        input_dim=2, latent_dim=2, num_components=3, likelihood="gaussian",
        encoder_hidden=(8,), decoder_hidden=(8,), dof=4.0, num_total=100,
    )
    state, x = _trained_state(spec, steps=10, seed=2)
    srv = serve.SvaeServer(state.nn_params, state.pgm_nat, spec,
                           buckets=(16,))
    serve.export_serving(srv, tmp_path / "aot", score_samples=10)
    aot = serve.load_exported(tmp_path / "aot")
    q = np.asarray(x)[:6]
    np.testing.assert_allclose(
        aot.encode(q)["z_mean"], srv.encode(q)["z_mean"],
        rtol=1e-6, atol=1e-6,
    )
    assert np.all(np.isfinite(aot.score(q, seed=2)))
