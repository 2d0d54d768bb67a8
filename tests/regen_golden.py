#!/usr/bin/env python
"""Deliberately regenerate the golden trajectory files (tests/golden/).

Run ONLY when the update math intentionally changes; commit the diff with
an explanation. Usage:  python tests/regen_golden.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from tests.test_parity import _gmm_trajectory  # noqa: E402


def main() -> None:
    from tests.test_parity import _svae_trajectory

    golden_dir = Path(__file__).parent / "golden"
    golden_dir.mkdir(exist_ok=True)
    values = _gmm_trajectory(jnp.float64, steps=25)
    (golden_dir / "gmm_pinwheel_f64.json").write_text(
        json.dumps([round(float(v), 6) for v in values.tolist()])
    )
    print(f"wrote gmm golden ({len(values)} steps, final={values[-1]:.3f})")
    svae_values = _svae_trajectory()
    (golden_dir / "svae_pinwheel_f64.json").write_text(
        json.dumps([round(float(v), 6) for v in svae_values.tolist()])
    )
    print(f"wrote svae golden ({len(svae_values)} steps, final={svae_values[-1]:.3f})")

    from tests.test_parity_shapes import _cvi_trajectory

    for shape in ("auto", "mnist"):
        vals = _cvi_trajectory(shape, jnp.float64)
        (golden_dir / f"svae_{shape}_f64.json").write_text(
            json.dumps([round(float(v), 6) for v in vals.tolist()])
        )
        print(f"wrote svae {shape}-shape golden ({len(vals)} steps, final={vals[-1]:.3f})")


if __name__ == "__main__":
    main()
