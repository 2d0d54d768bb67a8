"""Small units: config overlay, metrics logger, viz smoke, guards."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from svax.train.metrics import JsonlLogger, read_jsonl
from svax.utils import guards


def test_jsonl_logger_roundtrip(tmp_path):
    path = tmp_path / "m.jsonl"
    with JsonlLogger(path, echo=False) as lg:
        lg.log(1, elbo=-10.0, note="warm")
        lg.log(2, elbo=-9.0)
    rows = read_jsonl(path)
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[1]["elbo"] == -9.0
    assert "wall_s" in rows[0]


def test_apply_config_cli_override():
    import argparse

    from configs import apply_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="pinwheel-svae")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--rho", type=float, default=0.05)
    # User explicitly set --steps; config default should NOT clobber it.
    argv = ["--steps", "123"]
    args = p.parse_args(argv)
    apply_config(args, p, argv=argv)
    assert args.steps == 123
    assert args.rho == 0.05  # config value matches parser default here
    assert args.lr == 1e-3  # untyped flag takes the config value

    # Explicitly passing a value EQUAL to the parser default must still win
    # (ADVICE round 1: value-comparison clobbered it). pinwheel-svae sets a
    # different steps; the user's explicit --steps 2000 (== parser default)
    # stays.
    argv = ["--steps", "2000"]
    args = p.parse_args(argv)
    apply_config(args, p, argv=argv)
    assert args.steps == 2000


def test_guards_assert_finite():
    guards.assert_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        guards.assert_finite({"a": jnp.asarray([1.0, float("nan")])}, "bad")
    assert int(guards.count_nonfinite({"a": jnp.asarray([1.0, float("inf")])})) == 1


def test_viz_smoke(tmp_path):
    import jax

    from svax.data import make_pinwheel_data
    from svax.pgm import gmm
    from svax.utils import viz

    x = make_pinwheel_data(num_classes=3, num_per_class=15, seed=0)
    prior = gmm.make_prior(4, 2, dtype=jnp.float64)
    nat = gmm.init_variational(jax.random.PRNGKey(0), prior, jnp.asarray(x))
    resp, _ = gmm.e_step_obs(jnp.asarray(x), gmm.expected_params(nat))
    out = tmp_path / "clusters.png"
    viz.plot_gmm_clusters(x, np.asarray(resp), nat, out)
    assert out.exists() and out.stat().st_size > 1000

    log = tmp_path / "log.jsonl"
    log.write_text("\n".join(json.dumps({"step": i, "elbo": -float(i)}) for i in range(3)))
    curve = tmp_path / "curve.png"
    viz.plot_training_curves(log, curve, keys=("elbo",))
    assert curve.exists()


def test_augment_step_wrapper():
    """augment_step: sigma<=0 is identity; sigma>0 perturbs inputs with
    the split-before-step key discipline (the seed-robustness recipe —
    one definition shared by train_svae/seed_sweep/the demo)."""
    import jax

    from svax.train.loop import augment_step

    calls = []

    def step(state, xb, key):
        calls.append((xb, key))
        return state, {"elbo": jnp.sum(xb)}

    assert augment_step(step, 0.0) is step
    assert augment_step(step, -1.0) is step

    wrapped = augment_step(step, 0.5)
    x = jnp.ones((7, 2))
    key = jax.random.PRNGKey(3)
    _, m = wrapped({}, x, key)
    xb, k2 = calls[-1]
    k1, k2_exp = jax.random.split(key)
    assert jnp.array_equal(k2, k2_exp)
    expected = x + 0.5 * jax.random.normal(k1, x.shape, x.dtype)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(expected))
    assert float(jnp.max(jnp.abs(xb - x))) > 0.0


def test_pack_masked_binarizes_and_blocks_nan():
    """serve._pack_masked: any truthy mask value means 'observed' (the
    fixed-point update uses the mask as a float multiplier, so a
    fractional mask must be binarized — ADVICE r4), and NaN placeholders
    in masked-out slots must not leak through the packing."""
    from svax.serve import _pack_masked

    x = np.array([[1.0, np.nan], [3.0, 4.0]], np.float32)
    mask = np.array([[0.5, 0.0], [1.0, 0.25]], np.float32)
    xm = _pack_masked(x, mask)
    assert xm.shape == (2, 4)
    packed_x, packed_m = xm[:, :2], xm[:, 2:]
    np.testing.assert_array_equal(packed_m, [[1.0, 0.0], [1.0, 1.0]])
    np.testing.assert_array_equal(packed_x, [[1.0, 0.0], [3.0, 4.0]])
    # 1-D input promotes to a single row; mask broadcasts.
    xm1 = _pack_masked(np.array([1.0, 2.0], np.float32), 1.0)
    np.testing.assert_array_equal(xm1, [[1.0, 2.0, 1.0, 1.0]])


def test_round5_figure_script_smoke(tmp_path):
    """experiments/plot_round5.py renders both evidence figures from the
    committed runs/ artifacts into an arbitrary --out-dir (device-free:
    matplotlib only, safe anywhere). Guards the committed-figure pipeline
    against artifact-schema drift."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, str(repo / "experiments" / "plot_round5.py"),
         "--runs-dir", str(repo / "runs"), "--out-dir", str(tmp_path)],
        cwd=tmp_path, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for name in ("comparison_paired.png", "impute_quality.png",
                 "seed_distributions.png"):
        f = tmp_path / name
        assert f.exists() and f.stat().st_size > 10_000, name
