"""Numerical guards: NaN/Inf detection for the Cholesky-heavy paths.

SURVEY.md §6: the TPU rebuild's answer to "race detection / sanitizers" is
numerical sanitization — near-singular Σ̃ during early SVAE training is the
classic failure (§8 hard part #4). Two tools:

* ``enable_nan_debugging()`` — flips ``jax_debug_nans`` so the first NaN
  raises with a traceback (works under jit by falling back to eager
  re-execution of the offending primitive).
* ``assert_finite(tree, name)`` — checkify-free in-graph guard that turns
  non-finite leaves into an invalid ELBO early, used by CLIs under
  ``--debug-nans``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_debugging() -> None:
    jax.config.update("jax_debug_nans", True)


def assert_finite(tree, name: str = "tree") -> None:
    """Host-side finite check of a pytree (blocks; for debug cadences only)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(f"non-finite values in {name}{key}")


def count_nonfinite(tree) -> int:
    """In-graph count of non-finite elements across a pytree (jittable)."""
    total = jnp.zeros((), jnp.int32)
    for leaf in jax.tree_util.tree_leaves(tree):
        total = total + jnp.sum(~jnp.isfinite(jnp.asarray(leaf))).astype(jnp.int32)
    return total
