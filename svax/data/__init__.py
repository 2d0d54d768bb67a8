"""L5 — datasets: pinwheel synthetic, UCI Auto, MNIST (SURVEY.md §2 L5)."""

from __future__ import annotations

import numpy as np

from svax.data.auto import load_auto  # noqa: F401
from svax.data.mnist import load_mnist  # noqa: F401
from svax.data.pinwheel import load_pinwheel, make_pinwheel_data  # noqa: F401


def load_dataset(name: str, seed: int = 0) -> tuple[np.ndarray, np.ndarray, dict]:
    """Uniform (train, test, meta) loader over the BASELINE.json workloads."""
    if name == "pinwheel":
        train, test = load_pinwheel(seed=seed)
        return train, test, {"likelihood": "gaussian", "synthetic": False}
    if name == "auto":
        return load_auto(seed=seed)
    if name == "mnist":
        return load_mnist(seed=seed)
    raise ValueError(f"unknown dataset {name!r}")
