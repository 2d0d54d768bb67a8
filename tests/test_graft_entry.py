"""Driver-contract tests for __graft_entry__ (SURVEY.md §3b, §5).

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(n)`` on a box whose only real device is one TPU chip, so
both the 1-D data mesh (odd/small n) and the 2-D data×comp mesh (n ≥ 4,
even) branches must keep working on the virtual CPU mesh. conftest.py gives
this process 8 CPU devices, so ``_dryrun_impl`` runs directly; the
bootstrap wrapper's already-initialized branch is also exercised.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402

pytestmark = pytest.mark.slow  # full-suite tier (see CLAUDE.md)


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_dryrun_impl_mesh_matrix(n_devices, capsys):
    """1-D (n=2) and 2-D data×comp (n=4, 8) mesh branches both execute."""
    graft._dryrun_impl(n_devices)
    out = capsys.readouterr().out
    assert f"dryrun_multichip({n_devices}): ok" in out
    # The second pass runs the bigk geometry (K=100, d=10) the DP/comp
    # engines exist for — a shape-dependent sharding regression fails here.
    assert f"dryrun_multichip({n_devices}): bigk ok (K=100, d=10" in out
    if n_devices >= 4:
        assert "x2 data x comp" in out
    else:
        assert "2 data" in out


def test_dryrun_wrapper_initialized_backend(capsys):
    """With the backend live and enough devices, the wrapper runs in-process."""
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)
    assert "ok" in capsys.readouterr().out


def test_entry_compiles_and_is_finite():
    fn, args = graft.entry()
    elbo = jax.jit(fn)(*args)
    assert elbo.shape == ()
    assert bool(jax.numpy.isfinite(elbo))
