"""High-level Trainer: config → data → jitted loop → checkpoint → metrics.

The library-level equivalent of the reference's recalled ``main.py`` session
loop (SURVEY.md §2 L4), built around the TPU-first execution model: the hot
path runs in scan chunks (svax.train.loop) with host work only at eval/
checkpoint boundaries. Covers the SVAE; the GMM/SMM/VAE baselines use their
``make_train_step`` directly (their loops are three lines).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svax.models.svae import SvaeConfig
from svax.pgm import gmm
from svax.pgm.gmm import GmmNat
from svax.train import svae_step
from svax.train.loop import make_minibatch_scan_runner, make_scan_runner
from svax.train.metrics import JsonlLogger


@dataclass
class TrainerConfig:
    """Everything the training harness needs beyond the model config."""

    steps: int = 2000
    batch_size: int = 0  # 0 = full batch
    lr: float = 1e-3
    rho: float = 0.05
    rho_decay: float = 0.0  # rho_t = rho / (1 + decay·t)
    eval_every: int = 200
    scan_chunk: int = 0  # 0 = auto (eval_every, capped at 100)
    seed: int = 0
    data_parallel: bool = False
    component_shards: int = 1  # >1: shard K over a second mesh axis
    checkpoint_dir: str = ""
    logfile: str = ""
    encoder_hidden: tuple = (50, 50)
    decoder_hidden: tuple = (50, 50)
    prior_alpha: float = 1.0
    prior_kappa: float = 0.05


class SvaeTrainer:
    """End-to-end SVAE training with scan-chunked device-resident loops."""

    def __init__(
        self,
        model_config: SvaeConfig,
        trainer_config: TrainerConfig,
        input_dim: int,
        prior: GmmNat | None = None,
    ):
        self.mc = model_config
        self.tc = trainer_config
        self.input_dim = input_dim
        self.prior = prior if prior is not None else gmm.make_prior(
            model_config.num_components,
            model_config.latent_dim,
            alpha=trainer_config.prior_alpha,
            kappa=trainer_config.prior_kappa,
        )
        self.optimizer = optax.adam(trainer_config.lr)
        tc = trainer_config
        self.rho: float | Callable = (
            tc.rho
            if tc.rho_decay == 0.0
            else (lambda t: tc.rho / (1.0 + tc.rho_decay * t))
        )

    def init(self, key: jax.Array, data: jnp.ndarray | None = None):
        if data is not None and self.prior.dir_nat.dtype != data.dtype:
            # Keep the whole state in the data's dtype (e.g. float64 oracle
            # runs on CPU) so the scan carry stays type-stable.
            self.prior = jax.tree.map(lambda a: a.astype(data.dtype), self.prior)
        return svae_step.init_state(
            key,
            self.input_dim,
            self.mc,
            self.prior,
            self.optimizer,
            encoder_hidden=self.tc.encoder_hidden,
            decoder_hidden=self.tc.decoder_hidden,
            data=data,
            dtype=data.dtype if data is not None else jnp.float32,
        )

    def _build_step(self):
        from svax.parallel import mesh as pmesh

        if self.tc.data_parallel and self.tc.component_shards > 1:
            n_comp = self.tc.component_shards
            n_data = len(jax.devices()) // n_comp
            self._mesh = pmesh.make_data_comp_mesh(n_data, n_comp)
            builder = lambda prior_l: svae_step.make_train_step(  # noqa: E731
                self.mc, prior_l, self.optimizer, self.rho,
                axis_name="data", axis_comp="comp",
            )
            return pmesh.data_comp_parallel_step(builder, self.prior, self._mesh, jit=False)
        if self.tc.data_parallel:
            self._mesh = pmesh.make_data_mesh()
            inner = svae_step.make_train_step(
                self.mc, self.prior, self.optimizer, self.rho, axis_name="data"
            )
            return pmesh.data_parallel_step(inner, self._mesh, jit=False)
        return svae_step.make_train_step(self.mc, self.prior, self.optimizer, self.rho)

    def fit(self, x_train: jnp.ndarray, x_test: jnp.ndarray | None = None, state=None):
        tc, mc = self.tc, self.mc
        key = jax.random.PRNGKey(tc.seed)
        k_init, k_run = jax.random.split(key)
        if state is None:
            state = self.init(k_init, x_train)
        start = 0

        ckpt = None
        if tc.checkpoint_dir:
            from svax.train.checkpoint import Checkpointer

            ckpt = Checkpointer(tc.checkpoint_dir)
            state, k_run, start = ckpt.restore_or(state, k_run)

        n = x_train.shape[0]
        batch = tc.batch_size or n
        chunk = tc.scan_chunk or min(max(tc.eval_every, 1), 100)
        step = self._build_step()
        if tc.data_parallel:
            ndev = self._mesh.shape["data"]
            if batch % ndev:
                batch = (batch // ndev) * ndev or ndev
            if tc.batch_size == 0 and n % ndev:
                # Full-batch DP: trim to a shardable multiple of the mesh.
                n = (n // ndev) * ndev
                x_train = x_train[:n]
                batch = n
        if tc.data_parallel and batch >= n:
            # scan OVER the shard_map'd step: the whole chunk stays
            # device-resident with psums riding ICI inside the loop.
            runner = make_scan_runner(step, chunk)
        elif tc.data_parallel:
            runner = None  # minibatch DP: per-step host loop below
            step = jax.jit(step)
        elif batch >= n:
            runner = make_scan_runner(step, chunk)
        else:
            runner = make_minibatch_scan_runner(step, chunk)
        evaluate = jax.jit(svae_step.make_eval_fn(self.mc, self.prior))

        logger = JsonlLogger(tc.logfile or None)
        t = start
        while t < tc.steps:
            todo = min(chunk, tc.steps - t)
            k_run, k_chunk = jax.random.split(k_run)
            if tc.data_parallel and runner is None:
                for i in range(todo):
                    k_chunk, kb, ks = jax.random.split(k_chunk, 3)
                    xb = x_train[jax.random.choice(kb, n, (batch,), replace=False)]
                    state, metrics = step(state, xb, ks)
                last = {k: v for k, v in metrics.items()}
            elif batch >= n:
                if todo != chunk:
                    runner = make_scan_runner(step, todo)
                state, metrics = runner(state, x_train, k_chunk)
                last = {k: np.asarray(v)[-1] for k, v in metrics.items()}
            else:
                if todo != chunk:
                    runner = make_minibatch_scan_runner(step, todo)
                k_chunk, kb = jax.random.split(k_chunk)
                idx = jax.random.randint(kb, (todo, batch), 0, n)
                batches = x_train[idx]
                state, metrics = runner(state, batches, k_chunk)
                last = {k: np.asarray(v)[-1] for k, v in metrics.items()}
            t += todo

            row = {k: float(v) for k, v in last.items()}
            if x_test is not None:
                ev = evaluate(state, x_test, k_run)
                row["test_elbo_per_point"] = float(ev["elbo_per_point"])
            logger.log(t, **row)
            if ckpt is not None:
                ckpt.save(t, state, k_run)
        if ckpt is not None:
            ckpt.close()
        logger.close()
        return state
