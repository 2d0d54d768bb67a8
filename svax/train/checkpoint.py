"""Checkpoint/resume via orbax (SURVEY.md §6 checkpoint row).

Persists the full training state — NN params, optimizer state, PGM natural
parameters, step counter, and RNG key — and restores it exactly, so a
preempted run resumes bit-identically (tested in tests/test_checkpoint.py).
The reference used ``tf.train.Saver``; this is the TPU-native equivalent.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    """Thin orbax CheckpointManager wrapper over arbitrary state pytrees."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self._dir = Path(directory).resolve()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        )

    def save(self, step: int, state: Any, key: jax.Array) -> None:
        payload = {"state": state, "key": np.asarray(key)}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def restore_or(self, state: Any, key: jax.Array):
        """Return (state, key, start_step); falls through on empty dir."""
        latest = self._mgr.latest_step()
        if latest is None:
            return state, key, 0
        template = {"state": state, "key": np.asarray(key)}
        restored = self._mgr.restore(latest, args=ocp.args.StandardRestore(template))
        new_key = jax.numpy.asarray(restored["key"], dtype=jax.numpy.uint32)
        return restored["state"], new_key, int(latest)

    def latest_step(self):
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()
