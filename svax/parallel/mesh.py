"""Device mesh + shard_map data parallelism (SURVEY.md §3b, §9.5).

Design: train steps in ``svax.train``/``svax.models`` accept an optional
``axis_name``; when set they psum sufficient statistics, gradients, and
scalar metrics inside the step. This module provides the one-line wrapper
that runs such a step under ``shard_map`` over a 1-D ``("data",)`` mesh —
state replicated, batch sharded along its leading axis, RNG key folded with
the device index so Monte-Carlo draws decorrelate across shards. XLA lowers
the psums to ICI all-reduces on a real TPU slice; on CPU the same program
runs against ``--xla_force_host_platform_device_count`` virtual devices
(the test strategy of SURVEY.md §5).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(
    num_devices: int | None = None,
    devices=None,
    axis: str = "data",
) -> Mesh:
    """1-D mesh over the batch axis. Defaults to all available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch on the mesh, sharded along the leading axis."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis)))


def data_parallel_step(
    step: Callable,
    mesh: Mesh,
    axis: str = "data",
    fold_key: bool = True,
    jit: bool = True,
) -> Callable:
    """Wrap an axis-aware ``step(state, batch, key) → (state, metrics)``.

    ``step`` must have been built with ``axis_name=axis`` (so it psums its
    stats/grads internally and returns replicated outputs). The batch is
    sharded on its leading axis; everything else is replicated.
    """

    def body(state, batch, key):
        if fold_key:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return step(state, batch, key)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded) if jit else sharded


def make_data_comp_mesh(
    data_size: int, comp_size: int, devices=None
) -> Mesh:
    """2-D mesh ("data", "comp"): batch sharding × component sharding."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data_size * comp_size
    arr = np.asarray(devices[: data_size * comp_size]).reshape(data_size, comp_size)
    return Mesh(arr, ("data", "comp"))


def data_comp_parallel_step(
    step_builder: Callable,
    prior,
    mesh: Mesh,
    jit: bool = True,
) -> Callable:
    """shard_map wrapper for component×data parallelism.

    ``step_builder(prior_shard) → step(state, batch, key)`` builds the step
    around a K-shard of the conjugate prior (the prior must be sharded
    exactly like the variational naturals, so it enters shard_map as an
    argument rather than a closure). Batch shards over "data", PGM naturals
    over "comp" (leading K axis); NN params/optimizer stay replicated.
    """

    def body(prior_l, state, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        key = jax.random.fold_in(key, jax.lax.axis_index("comp"))
        return step_builder(prior_l)(state, batch, key)

    def specs_for_state(state):
        return type(state)(
            nn_params=P(),
            opt_state=P(),
            pgm_nat=jax.tree.map(lambda _: P("comp"), state.pgm_nat),
            step=P(),
        )

    def wrapped(state, batch, key):
        state_specs = specs_for_state(state)
        prior_specs = jax.tree.map(lambda _: P("comp"), prior)
        sharded = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(prior_specs, state_specs, P("data"), P()),
            out_specs=(state_specs, P()),
            check_vma=False,
        )
        return sharded(prior, state, batch, key)

    return jax.jit(wrapped) if jit else wrapped


def data_parallel_gmm_step(step: Callable, mesh: Mesh, axis: str = "data", jit: bool = True) -> Callable:
    """Same wrapper for the pure-GMM step signature (state, batch)."""

    def body(state, batch):
        return step(state, batch)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded) if jit else sharded
