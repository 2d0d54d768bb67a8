"""High-level Trainer: config → data → jitted loop → checkpoint → metrics.

The library-level equivalent of the reference's recalled ``main.py`` session
loop (SURVEY.md §2 L4), built around the TPU-first execution model: the hot
path runs in scan chunks (svax.train.loop) with host work only at eval/
checkpoint boundaries. ONE engine (``Trainer``) owns the loop mechanics —
scan chunking, minibatch stacking, data-parallel shard_map wrapping,
checkpoint/resume, JSONL logging — and every workload (SVAE, pure GMM, SMM,
plain VAE) plugs in through four small hooks, so the harness story is the
same across model families (VERDICT r1 #8).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

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
    # --- best-held-out tracking / time-to-target (BASELINE metric #2) ---
    # Metric key to MAXIMIZE from the eval hook's dict ("" = the first key
    # the hook returns, e.g. test_elbo_per_point). Tracking activates
    # whenever an eval hook and a test set are present.
    track_metric: str = ""
    # Stop after this many consecutive evals without ≥ min_delta
    # improvement (0 = never stop early). Evals happen once per chunk.
    patience: int = 0
    min_delta: float = 0.0
    # Optional target: the first eval where the metric reaches it is
    # recorded as {target_step, target_wall_s} — "time-to-target" as a
    # first-class artifact instead of hand-read JSONL.
    target_value: float | None = None
    # Where to write the summary JSON ("" = don't write; the summary is
    # always available as trainer.best after fit()).
    best_artifact: str = ""
    # Execution engine for the hot loop: "xla" (scan-chunked jitted step,
    # the default), "megakernel" (the whole-train-step Pallas kernel —
    # raises with the reason when the workload is outside its shape
    # class), or "auto" (megakernel when supported AND on TPU, else xla).
    engine: str = "xla"
    # Mixture-megakernel only: complete steps per grid iteration (see
    # mixstep_pallas.train_chunk). >1 is an opt-in ~9% GMM throughput win
    # that trades away the bit-exact chunk-split/resume contract (each U
    # compiles its own body; cross-U agreement is ~1e-6 rel).
    megakernel_unroll: int = 1
    # --- VAE-style warmup + k-means++ reseed (svax.train.warmup) ---
    # When latent_dim != input_dim the components can't be seeded from
    # data and CVI collapses the mixture to one component (measured:
    # purity 0.117 on the MNIST surrogate). warmup_steps > 0 first trains
    # the nets rho=0 (PGM frozen), then reseeds q's naturals by k-means++
    # on the encoded latent means (purity 1.0 on the same surrogate).
    # Skipped automatically when resuming from a checkpoint past step 0.
    warmup_steps: int = 0
    reseed_pseudo_counts: float = 5.0
    reseed_cov_scale: float = 0.0  # 0 = auto (within-cluster variance)


def _rho_schedule(tc: TrainerConfig) -> float | Callable:
    if tc.rho_decay == 0.0:
        return tc.rho
    return lambda t: tc.rho / (1.0 + tc.rho_decay * t)


class Trainer:
    """Generic scan-chunked training engine.

    Subclass hooks:
      * ``init(key, data) → state`` — build the initial train state;
      * ``make_step(axis_name=None) → step(state, batch, key)`` — the
        jittable train step; when ``axis_name`` is given the step must psum
        its stats/grads over that mesh axis (the DP contract);
      * ``make_comp_dp_step() → step`` — optional 2-D data×component mesh
        path (SVAE only today);
      * ``make_eval() → fn(state, x_test, key) → dict`` — optional held-out
        metrics, merged into each logged row.

    The engine owns everything else. Steps for models that don't consume a
    PRNG key are adapted by the subclass (the key argument is ignored), so
    the scan runners and shard_map wrappers are shared unchanged.
    """

    def __init__(self, trainer_config: TrainerConfig):
        self.tc = trainer_config
        self._num_total: int = 0  # set by fit() from the training set
        # Best-held-out tracking results, populated by fit() when an eval
        # hook and a test set are present: ``best`` is the time-to-target
        # summary dict, ``best_state`` a host snapshot at the best eval.
        self.best: dict | None = None
        self.best_state = None

    # -- hooks ------------------------------------------------------------
    def init(self, key: jax.Array, data):
        raise NotImplementedError

    def make_step(self, axis_name: str | None = None) -> Callable:
        raise NotImplementedError

    def make_comp_dp_step(self) -> Callable:
        raise NotImplementedError(
            f"{type(self).__name__} has no component-parallel path"
        )

    def make_eval(self) -> Callable | None:
        return None

    def make_megakernel_runner(self) -> Callable | None:
        """Hook: chunk runner for ``engine != "xla"`` (None = no such path).

        Must honor the engine contract: return None for "auto" when the
        workload is unsupported (silent fallback to xla), raise for an
        explicit "megakernel" request it cannot serve.
        """
        if self.tc.engine == "megakernel":
            raise ValueError(
                f"{type(self).__name__} has no megakernel engine"
            )
        return None

    def sync_dtype(self, data) -> None:
        """Align any model-side dtypes (e.g. the conjugate prior) to the data."""

    def warmup(self, state, x_train, key):
        """Hook: phase-1 warmup + reseed when ``tc.warmup_steps > 0``."""
        raise NotImplementedError(
            f"{type(self).__name__} has no warmup path (warmup_steps="
            f"{self.tc.warmup_steps} requires an encoder to reseed from)"
        )

    # -- engine -----------------------------------------------------------
    def _build_step(self) -> Callable:
        from svax.parallel import mesh as pmesh

        if self.tc.data_parallel and self.tc.component_shards > 1:
            return self.make_comp_dp_step()
        if self.tc.data_parallel:
            self._mesh = pmesh.make_data_mesh()
            return pmesh.data_parallel_step(
                self.make_step(axis_name="data"), self._mesh, jit=False
            )
        return self.make_step()

    def fit(self, x_train: jnp.ndarray, x_test: jnp.ndarray | None = None, state=None):
        tc = self.tc
        self._num_total = int(x_train.shape[0])
        self.sync_dtype(x_train)
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

        if tc.warmup_steps > 0 and start == 0:
            k_run, k_warm = jax.random.split(k_run)
            state = self.warmup(state, x_train, k_warm)

        n = x_train.shape[0]
        batch = tc.batch_size or n
        chunk = tc.scan_chunk or min(max(tc.eval_every, 1), 100)
        mega = None
        if tc.engine != "xla":
            mega = self.make_megakernel_runner()
        if mega is not None:
            runner = None
            step = None
        else:
            step = self._build_step()
        if mega is not None:
            pass
        elif tc.data_parallel:
            ndev = self._mesh.shape["data"]
            if batch % ndev:
                batch = (batch // ndev) * ndev or ndev
            if tc.batch_size == 0 and n % ndev:
                # Full-batch DP: trim to a shardable multiple of the mesh.
                n = (n // ndev) * ndev
                x_train = x_train[:n]
                batch = n
        if mega is not None:
            pass  # the megakernel runner takes t_steps directly
        elif tc.data_parallel and batch >= n:
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
        evaluate = self.make_eval()

        import time

        logger = JsonlLogger(tc.logfile or None)
        tracking = evaluate is not None and x_test is not None
        self.best = None
        self.best_state = None
        best_ckpt = None
        if ckpt is not None and tracking:
            from svax.train.checkpoint import Checkpointer

            best_ckpt = Checkpointer(
                str(tc.checkpoint_dir).rstrip("/") + "/best", max_to_keep=1
            )
        best_val = float("-inf")
        best_step = -1
        best_wall = 0.0
        since_improve = 0
        stopped_early = False
        target_step = None
        target_wall = None
        metric_key = tc.track_metric or None
        wall_t0 = time.perf_counter()
        t = start
        while t < tc.steps:
            todo = min(chunk, tc.steps - t)
            k_run, k_chunk = jax.random.split(k_run)
            if mega is not None:
                state, metrics = mega(state, x_train, todo, seed=tc.seed)
                last = {k: np.asarray(v)[-1] for k, v in metrics.items()}
            elif tc.data_parallel and runner is None:
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
            if tracking:
                ev = evaluate(state, x_test, k_run)
                row.update({k: float(v) for k, v in ev.items()})
                if metric_key is None:
                    metric_key = next(iter(ev))
                val = float(ev[metric_key])
                wall = time.perf_counter() - wall_t0
                if val > best_val + tc.min_delta:
                    best_val, best_step, best_wall = val, t, wall
                    since_improve = 0
                    # Host snapshot of the best state (cheap at these model
                    # sizes) so callers get the best-step model even without
                    # checkpointing; with checkpointing it also persists.
                    self.best_state = jax.device_get(state)
                    if best_ckpt is not None:
                        best_ckpt.save(t, state, k_run)
                else:
                    since_improve += 1
                if (
                    tc.target_value is not None
                    and target_step is None
                    and val >= tc.target_value
                ):
                    target_step, target_wall = t, wall
            logger.log(t, **row)
            if ckpt is not None:
                ckpt.save(t, state, k_run)
            if tracking and tc.patience and since_improve >= tc.patience:
                stopped_early = True
                break
        if ckpt is not None:
            ckpt.close()
        if best_ckpt is not None:
            best_ckpt.close()
        logger.close()
        if tracking:
            self.best = {
                "metric": metric_key,
                "best_value": best_val,
                "best_step": best_step,
                "best_wall_s": round(best_wall, 3),
                "target": tc.target_value,
                "target_step": target_step,
                "target_wall_s": None if target_wall is None else round(target_wall, 3),
                "stopped_early": stopped_early,
                "steps_run": t,
                "total_wall_s": round(time.perf_counter() - wall_t0, 3),
            }
            if tc.best_artifact:
                import json
                from pathlib import Path

                path = Path(tc.best_artifact)
                path.parent.mkdir(parents=True, exist_ok=True)
                path.write_text(json.dumps(self.best, indent=1))
        return state


class SvaeTrainer(Trainer):
    """End-to-end SVAE training with scan-chunked device-resident loops."""

    def __init__(
        self,
        model_config: SvaeConfig,
        trainer_config: TrainerConfig,
        input_dim: int,
        prior: GmmNat | None = None,
    ):
        super().__init__(trainer_config)
        self.mc = model_config
        self.input_dim = input_dim
        self.prior = prior if prior is not None else gmm.make_prior(
            model_config.num_components,
            model_config.latent_dim,
            alpha=trainer_config.prior_alpha,
            kappa=trainer_config.prior_kappa,
        )
        self.optimizer = optax.adam(trainer_config.lr)
        self.rho = _rho_schedule(trainer_config)

    def sync_dtype(self, data) -> None:
        if data is not None and self.prior.dir_nat.dtype != data.dtype:
            # Keep the whole state in the data's dtype (e.g. float64 oracle
            # runs on CPU) so the scan carry stays type-stable.
            self.prior = jax.tree.map(lambda a: a.astype(data.dtype), self.prior)

    def init(self, key: jax.Array, data=None):
        self.sync_dtype(data)
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

    def make_step(self, axis_name: str | None = None) -> Callable:
        return svae_step.make_train_step(
            self.mc, self.prior, self.optimizer, self.rho, axis_name=axis_name
        )

    def warmup(self, state, x_train, key):
        from svax.train.warmup import vae_warmup_reseed

        state, info = vae_warmup_reseed(
            state, x_train, self.mc, self.prior, self.optimizer, key,
            steps=self.tc.warmup_steps, batch_size=self.tc.batch_size,
            scan_chunk=self.tc.scan_chunk or 100,
            pseudo_counts=self.tc.reseed_pseudo_counts,
            cov_scale=self.tc.reseed_cov_scale, seed=self.tc.seed,
        )
        self.warmup_info = info
        return state

    def make_megakernel_runner(self) -> Callable | None:
        from svax.train.loop import (
            make_megakernel_runner,
            megakernel_unsupported_reason,
        )

        if self.tc.megakernel_unroll != 1:
            # Loud gate, not a silent ignore: the unroll knob exists only
            # on the mixture megakernel (GmmTrainer/SmmTrainer).
            raise ValueError(
                "megakernel_unroll applies only to the mixture megakernel "
                "engines; the SVAE tinystep/flexstep kernels have no "
                "unroll (their per-grid-iteration overhead is <1% of the "
                "step — docs/DESIGN.md mixstep note)"
            )
        reason = megakernel_unsupported_reason(
            self.mc,
            batch_full=self.tc.batch_size == 0,
            encoder_hidden=tuple(self.tc.encoder_hidden),
            decoder_hidden=tuple(self.tc.decoder_hidden),
            rho=self.rho,
            data_parallel=self.tc.data_parallel,
            component_shards=self.tc.component_shards,
            input_dim=self.input_dim,
            rho_decay=self.tc.rho_decay,
        )
        if self.tc.engine == "auto":
            # Auto only picks the kernel where it actually wins: supported
            # shape AND a real TPU (interpret mode is for tests, not auto).
            if reason is not None or jax.devices()[0].platform != "tpu":
                return None
        elif reason is not None:
            raise ValueError(f"engine='megakernel': {reason}")
        return make_megakernel_runner(
            self.mc, self.prior, lr=self.tc.lr, rho=self.tc.rho,
            rho_decay=self.tc.rho_decay, batch_size=self.tc.batch_size,
            encoder_hidden=tuple(self.tc.encoder_hidden),
            decoder_hidden=tuple(self.tc.decoder_hidden),
        )

    def make_comp_dp_step(self) -> Callable:
        from svax.parallel import mesh as pmesh

        n_comp = self.tc.component_shards
        n_data = len(jax.devices()) // n_comp
        self._mesh = pmesh.make_data_comp_mesh(n_data, n_comp)
        builder = lambda prior_l: svae_step.make_train_step(  # noqa: E731
            self.mc, prior_l, self.optimizer, self.rho,
            axis_name="data", axis_comp="comp",
        )
        return pmesh.data_comp_parallel_step(builder, self.prior, self._mesh, jit=False)

    def make_eval(self) -> Callable:
        inner = jax.jit(svae_step.make_eval_fn(self.mc, self.prior))

        def evaluate(state, x_test, key):
            ev = inner(state, x_test, key)
            return {"test_elbo_per_point": ev["elbo_per_point"]}

        return evaluate


class _ConjugateMixtureTrainer(Trainer):
    """Shared adapter for the unkeyed pure-mixture baselines (GMM, SMM)."""

    def __init__(
        self,
        trainer_config: TrainerConfig,
        num_components: int,
        data_dim: int,
        prior: GmmNat | None = None,
        fused: bool = False,
    ):
        super().__init__(trainer_config)
        self.prior = prior if prior is not None else gmm.make_prior(
            num_components,
            data_dim,
            alpha=trainer_config.prior_alpha,
            kappa=trainer_config.prior_kappa,
        )
        self.fused = fused
        self.rho = _rho_schedule(trainer_config)

    def sync_dtype(self, data) -> None:
        if data is not None and self.prior.dir_nat.dtype != data.dtype:
            self.prior = jax.tree.map(lambda a: a.astype(data.dtype), self.prior)

    def _make_raw_step(self, axis_name):
        raise NotImplementedError

    def make_step(self, axis_name: str | None = None) -> Callable:
        raw = self._make_raw_step(axis_name)
        return lambda state, batch, key: raw(state, batch)  # key-adapted

    def make_megakernel_runner(self) -> Callable | None:
        from svax.train.loop import (
            make_mixture_megakernel_runner,
            mixture_megakernel_unsupported_reason,
        )

        reason = mixture_megakernel_unsupported_reason(
            data_dim=self.prior.niw_nat.eta1.shape[-1],
            batch_full=self.tc.batch_size == 0,
            rho=self.rho,
            data_parallel=self.tc.data_parallel,
            component_shards=self.tc.component_shards,
        )
        if self.tc.engine == "auto":
            # Same policy as the SVAE engine: auto picks the kernel only
            # where it wins — supported shape AND a real TPU.
            if reason is not None or jax.devices()[0].platform != "tpu":
                return None
        elif reason is not None:
            raise ValueError(f"engine='megakernel': {reason}")
        return make_mixture_megakernel_runner(
            self.prior, rho=self.rho, dof=getattr(self, "dof", 0.0),
            unroll=self.tc.megakernel_unroll,
        )


class GmmTrainer(_ConjugateMixtureTrainer):
    """Pure-GMM natural-gradient VMP through the shared engine
    (BASELINE config #2; SURVEY.md §4.2 call stack)."""

    def init(self, key: jax.Array, data=None):
        from svax.models import gmm_baseline

        self.sync_dtype(data)
        return gmm_baseline.init_state(key, self.prior, data)

    def _make_raw_step(self, axis_name):
        from svax.models import gmm_baseline

        return gmm_baseline.make_train_step(
            self.prior, self.rho, num_total=self._num_total,
            axis_name=axis_name, fused=self.fused,
        )

    def make_eval(self) -> Callable:
        from svax.models import gmm_baseline

        def evaluate(state, x_test, key):
            ev = gmm_baseline.evaluate(
                state.nat, self.prior, x_test, num_total=self._num_total
            )
            return {"test_evidence_per_point": ev["evidence_per_point"]}

        return evaluate


class SmmTrainer(_ConjugateMixtureTrainer):
    """Student-t mixture (Gamma scale augmentation) through the engine."""

    def __init__(self, trainer_config, num_components, data_dim,
                 prior=None, dof: float = 4.0):
        super().__init__(trainer_config, num_components, data_dim, prior)
        self.dof = dof

    def init(self, key: jax.Array, data=None):
        from svax.models import smm_baseline

        self.sync_dtype(data)
        return smm_baseline.init_state(key, self.prior, data)

    def _make_raw_step(self, axis_name):
        from svax.models import smm_baseline

        return smm_baseline.make_train_step(
            self.prior, self.rho, num_total=self._num_total,
            dof=self.dof, axis_name=axis_name,
        )


class VaeTrainer(Trainer):
    """Plain-VAE baseline through the shared engine (SURVEY.md §4.3)."""

    def __init__(self, model_config, trainer_config: TrainerConfig, input_dim: int):
        from svax.models import vae

        super().__init__(trainer_config)
        self.mc = model_config
        self.input_dim = input_dim
        self.optimizer = optax.adam(trainer_config.lr)
        self._vae = vae

    def init(self, key: jax.Array, data=None):
        return self._vae.init_state(
            key, self.input_dim, self.mc, self.optimizer,
            self.tc.encoder_hidden, self.tc.decoder_hidden,
            dtype=data.dtype if data is not None else jnp.float32,
        )

    def make_step(self, axis_name: str | None = None) -> Callable:
        return self._vae.make_train_step(self.mc, self.optimizer, axis_name=axis_name)

    def make_eval(self) -> Callable:
        inner = jax.jit(
            lambda params, x, k: self._vae.elbo(params, x, k, self.mc)[0]
        )

        def evaluate(state, x_test, key):
            return {"test_elbo_per_point": inner(state.params, x_test, key)}

        return evaluate
