"""Inference / serving layer: self-describing model bundles + a batched,
recompile-free prediction server.

The reference had no serving story (training scripts only — SURVEY.md §2:
"no serving layer"); this module is a rebuild-first component for the
production side of the framework:

* **Bundles.** ``save_bundle`` writes the trained state (orbax) next to a
  ``spec.json`` capturing the full architecture/hyperparameters, so
  ``load_bundle`` can reconstruct the model with ZERO caller-side flags —
  unlike the training-time checkpoints, which assume the caller re-supplies
  the config (experiments/evaluate.py).
* **Bucketed batching.** XLA compiles one executable per input shape; a
  serving path that jits on raw request sizes recompiles for every new
  batch size (seconds to minutes through a remote-TPU tunnel). The server
  pads every request up to a fixed bucket ladder, so at most
  ``len(buckets)`` executables exist per endpoint and steady-state requests
  are pure dispatch. Padding rows are computed and discarded — every
  endpoint here is row-independent, so garbage rows cannot contaminate
  real ones.

Endpoints: ``encode`` (structured posterior: latent mean, responsibilities,
hard cluster), ``score`` (importance-weighted log-likelihood per point),
``reconstruct`` (decoder pass at the posterior mean), ``impute``
(missing-data fill-in by iterated encode → posterior-mean decode), and
``generate`` (sample the generative model). GMM- and SMM-prior (Student-t)
SVAEs both serve; the plain VAE has its own lighter path via
``evaluation.vae_iw_loglik``.

* **AOT export.** ``export_serving`` ahead-of-time lowers every
  endpoint × bucket to serialized StableHLO (``jax.export``) with the
  trained weights baked in as constants and BOTH cpu and tpu lowerings,
  so ``load_exported`` can serve from the artifact directory alone — no
  svax model code, no orbax, no re-trace — and the same artifact runs on
  a TPU host or a CPU fallback box. This is the deployment tier below
  bundles: bundles rebuild the (resumable) python model; exports are the
  frozen, versionable thing you ship.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from svax.models.svae import SvaeConfig

_ACTIVATIONS = {"tanh": jnp.tanh, "relu": jax.nn.relu, "softplus": jax.nn.softplus}
_SPEC_FILE = "spec.json"
_DEFAULT_BUCKETS = (32, 128, 512, 2048, 8192)


@dataclass(frozen=True)
class ModelSpec:
    """Everything needed to rebuild the model skeleton from disk."""

    input_dim: int
    latent_dim: int
    num_components: int
    likelihood: str = "gaussian"
    encoder_hidden: tuple = (50, 50)
    decoder_hidden: tuple = (50, 50)
    num_samples: int = 1
    alpha: float = 1.0
    kappa: float = 0.05
    dof: float = 0.0  # > 0 → Student-t (SMM) latent prior
    smm_iters: int = 2
    activation: str = "tanh"
    num_total: int = 1
    encoder_head: str = "diag"  # or "full" (nets.encoder_apply docstring)

    def to_config(self) -> SvaeConfig:
        return SvaeConfig(
            latent_dim=self.latent_dim,
            num_components=self.num_components,
            num_samples=self.num_samples,
            likelihood=self.likelihood,
            num_total=self.num_total,
            activation=_ACTIVATIONS[self.activation],
            dof=self.dof,
            smm_iters=self.smm_iters,
            encoder_head=self.encoder_head,
        )

    def make_prior(self):
        from svax.pgm import gmm

        return gmm.make_prior(
            self.num_components, self.latent_dim, alpha=self.alpha, kappa=self.kappa
        )


def save_bundle(directory: str | Path, state, spec: ModelSpec) -> None:
    """Write a self-describing serving bundle: orbax state + spec.json.

    ``state`` is the SvaeTrainState (its optimizer state rides along — it
    is small at these model sizes and keeps the bundle resumable).
    """
    from svax.train.checkpoint import Checkpointer

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    ckpt = Checkpointer(directory / "state")
    ckpt.save(int(state.step), state, jax.random.PRNGKey(0))
    ckpt.close()
    payload = asdict(spec)
    payload["encoder_hidden"] = list(spec.encoder_hidden)
    payload["decoder_hidden"] = list(spec.decoder_hidden)
    (directory / _SPEC_FILE).write_text(json.dumps(payload, indent=2))


def load_bundle(directory: str | Path, buckets=_DEFAULT_BUCKETS) -> "SvaeServer":
    """Rebuild a server from ``save_bundle`` output — no caller-side flags."""
    import optax

    from svax.train import svae_step
    from svax.train.checkpoint import Checkpointer

    directory = Path(directory)
    raw = json.loads((directory / _SPEC_FILE).read_text())
    raw["encoder_hidden"] = tuple(raw["encoder_hidden"])
    raw["decoder_hidden"] = tuple(raw["decoder_hidden"])
    spec = ModelSpec(**raw)
    template = svae_step.init_state(
        jax.random.PRNGKey(0),
        spec.input_dim,
        spec.to_config(),
        spec.make_prior(),
        optax.adam(1e-3),
        spec.encoder_hidden,
        spec.decoder_hidden,
    )
    ckpt = Checkpointer(directory / "state")
    if ckpt.latest_step() is None:
        ckpt.close()
        raise FileNotFoundError(f"no saved state under {directory / 'state'}")
    state, _, _ = ckpt.restore_or(template, jax.random.PRNGKey(0))
    ckpt.close()
    return SvaeServer(state.nn_params, state.pgm_nat, spec, buckets=buckets)


def _pack_masked(x, mask):
    """Pack ``[x | mask]`` on the feature axis (shared impute preamble).

    The mask is binarized after broadcast — any truthy value means
    "observed" — so a fractional mask cannot silently blend the zeroed
    placeholder with the reconstruction inside the fixed-point update
    (which uses the mask as a float multiplier). np.where, not ``x*mask``:
    NaN placeholders must not leak (NaN*0=NaN). Shared by both serving
    tiers so the mask contract cannot drift between live and AOT.
    """
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[None]
    mask = (np.broadcast_to(np.asarray(mask), x.shape) > 0).astype(np.float32)
    return np.concatenate([np.where(mask > 0, x, 0.0), mask], axis=-1)


def _pick_bucket(buckets, n: int) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _bucketed_dispatch(buckets, fn, x, *args):
    """Pad to the bucket ladder; chunk requests above the top bucket.

    Shared by the jit-backed ``SvaeServer`` and the AOT
    ``ExportedServer`` — the batching contract (at most len(buckets)
    executables per endpoint, padded rows computed-and-discarded, pure
    dispatch at steady state) is identical for both tiers.
    """
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[None]
    n = x.shape[0]
    top = buckets[-1]
    outs = []
    for start in range(0, n, top):
        piece = x[start : start + top]
        m = piece.shape[0]
        b = _pick_bucket(buckets, m)
        if m < b:
            piece = np.concatenate(
                [piece, np.zeros((b - m,) + piece.shape[1:], piece.dtype)]
            )
        out = fn(jnp.asarray(piece), *args)
        # One async-batched device→host fetch for the whole output tree:
        # np.asarray per leaf would serialize a tunnel round trip per
        # array (measured ~3x the latency on multi-output endpoints).
        out = jax.device_get(out)
        outs.append(jax.tree.map(lambda a: np.asarray(a)[:m], out))
    if len(outs) == 1:
        return outs[0]
    return jax.tree.map(lambda *parts: np.concatenate(parts), *outs)


class SvaeServer:
    """Batched, recompile-free inference over a trained (GMM|SMM)-SVAE.

    All endpoints accept numpy or jax arrays of shape (n, input_dim) for
    any n ≥ 1 and return numpy arrays of the same leading length. Requests
    are padded to a fixed bucket ladder so each endpoint compiles at most
    ``len(buckets)`` times; oversize requests are chunked over the largest
    bucket.
    """

    def __init__(self, nn_params, pgm_nat, spec: ModelSpec,
                 buckets=_DEFAULT_BUCKETS):
        from svax.models import svae as svae_mod
        from svax.nets import mlp as nets
        from svax.pgm import gmm

        self.spec = spec
        self.config = spec.to_config()
        self._nn = nn_params
        self._nat = pgm_nat
        self._prior = spec.make_prior()
        self._buckets = tuple(sorted(buckets))
        dof = spec.dof
        act = _ACTIVATIONS[spec.activation]

        def posterior(x):
            exp = gmm.expected_params(pgm_nat)
            pot_h, pot_p = nets.encoder_apply(
                nn_params["encoder"], x, act, head=spec.encoder_head
            )
            if dof > 0.0:
                from svax.models import svae_smm

                post, _ = svae_smm.smm_combine(
                    pot_h, pot_p, exp, dof, spec.smm_iters
                )
            else:
                post = svae_mod.sin_combine(pot_h, pot_p, exp)
            return post

        def encode_fn(x):
            post = posterior(x)
            resp = jnp.exp(post.log_resp)
            z_mean = jnp.einsum("nk,nkd->nd", resp, post.mean)
            return {
                "z_mean": z_mean,
                "responsibilities": resp,
                "component": jnp.argmax(post.log_resp, axis=-1),
            }

        def reconstruct_fn(x):
            post = posterior(x)
            resp = jnp.exp(post.log_resp)
            z_mean = jnp.einsum("nk,nkd->nd", resp, post.mean)
            out = nets.decoder_apply(
                nn_params["decoder"], z_mean, spec.likelihood, act
            )
            if spec.likelihood == "gaussian":
                return out[0]
            return jax.nn.sigmoid(out)

        def score_fn(x, key, num_samples):
            from svax.models import evaluation

            fn = (
                evaluation.svae_smm_iw_loglik if dof > 0.0
                else evaluation.svae_iw_loglik
            )
            return fn(nn_params, pgm_nat, x, key, self.config, num_samples)

        def impute_fn(xm, num_iters, hard=False):
            # Missing-data fill-in: xm packs [x | mask] on the feature axis
            # (mask 1 = observed, 0 = missing) so the bucket dispatch pads
            # one array; padded rows arrive all-missing and are discarded.
            # Iterate encode → combine → decode, writing the reconstruction
            # back into the missing coordinates only (SURVEY.md §9.4's
            # combine is the machinery; the standard SVAE imputation
            # protocol). ``hard=False`` decodes the responsibility-weighted
            # posterior mean (the conditional-mean fill); ``hard=True``
            # decodes the MAP component's mean — the decision rule for
            # MULTIMODAL conditionals, where averaging modes lands off the
            # data manifold (measured: pinwheel hide-one-coordinate RMSE,
            # runs/impute_quality.json — a fill only the structured
            # posterior can offer; a VAE has no components to pick).
            # Observed coordinates pass through bit-exactly.
            x, mask = jnp.split(xm, 2, axis=-1)
            x0 = mask * x

            def decode_z(z):
                out = nets.decoder_apply(
                    nn_params["decoder"], z, spec.likelihood, act
                )
                if spec.likelihood == "gaussian":
                    return out[0]
                return jax.nn.sigmoid(out)

            def body(x_cur, _):
                post = posterior(x_cur)
                if hard:
                    idx = jnp.argmax(post.log_resp, axis=-1)
                    z = jnp.take_along_axis(
                        post.mean, idx[:, None, None], axis=1
                    )[:, 0]
                else:
                    resp = jnp.exp(post.log_resp)
                    z = jnp.einsum("nk,nkd->nd", resp, post.mean)
                return mask * x + (1.0 - mask) * decode_z(z), None

            out, _ = jax.lax.scan(body, x0, None, length=num_iters)
            return out

        self._encode = jax.jit(encode_fn)
        self._reconstruct = jax.jit(reconstruct_fn)
        self._score = jax.jit(score_fn, static_argnums=(2,))
        self._impute = jax.jit(impute_fn, static_argnums=(1, 2))
        # Unjitted endpoint bodies — export_serving re-wraps them with
        # export-friendly signatures (seed scalar instead of a PRNG key).
        self._raw_fns = {
            "encode": encode_fn,
            "reconstruct": reconstruct_fn,
            "score": score_fn,
            "impute": impute_fn,
        }

    # ------------------------------------------------------------- helpers

    def _batched(self, fn, x, *args):
        return _bucketed_dispatch(self._buckets, fn, x, *args)

    # ----------------------------------------------------------- endpoints

    def encode(self, x):
        """Structured posterior: z_mean (n,d), responsibilities (n,K),
        hard component (n,)."""
        return self._batched(self._encode, x)

    def reconstruct(self, x):
        """Decoder output at the posterior-mean latent: Gaussian mean or
        Bernoulli pixel probabilities, (n, input_dim)."""
        return self._batched(self._reconstruct, x)

    def score(self, x, key=None, num_samples: int = 100):
        """Per-point importance-weighted log-likelihood bound, (n,)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._batched(self._score, x, key, num_samples)

    def cluster(self, x):
        """Hard cluster assignment, (n,) int."""
        return self.encode(x)["component"]

    def impute(self, x, mask, num_iters: int = 10, mode: str = "mean"):
        """Fill missing coordinates by iterated structured decoding.

        ``mask`` is truthy where ``x`` is observed and 0 where it is
        missing (broadcastable to ``x``'s shape; binarized internally).
        Missing entries of ``x`` are ignored (any placeholder value
        works); observed entries are returned untouched. ``mode="mean"``
        decodes the responsibility-weighted posterior mean;
        ``mode="map"`` decodes the MAP component's mean — use it when
        the conditional is multimodal (mode-averaging fills land between
        the data's modes; see runs/impute_quality.json). Returns
        (n, input_dim): decoder means for Gaussian likelihoods, pixel
        probabilities for Bernoulli.
        """
        if mode not in ("mean", "map"):
            raise ValueError(f"mode must be 'mean' or 'map', got {mode!r}")
        return self._batched(self._impute, _pack_masked(x, mask),
                             num_iters, mode == "map")

    def generate(self, num: int, key=None, sample_params: bool = False):
        """Sample the generative model: (x, z, component labels)."""
        from svax.models import svae as svae_mod

        if key is None:
            key = jax.random.PRNGKey(0)
        x, z, labels = svae_mod.generate(
            self._nn, self._nat, key, num, self.config, sample_params=sample_params
        )
        return np.asarray(x), np.asarray(z), np.asarray(labels)


# --------------------------------------------------------------- AOT export

_EXPORT_MANIFEST = "exports.json"


def export_serving(server: SvaeServer, directory: str | Path,
                   buckets=None, score_samples: int = 100,
                   impute_iters: int = 10, impute_mode: str = "mean",
                   platforms=("cpu", "tpu")) -> dict:
    """Ahead-of-time lower every endpoint × bucket to serialized StableHLO.

    Writes ``<endpoint>_<bucket>.stablehlo`` artifacts (``jax.export``
    serialization: weights baked in as constants, lowered for every
    platform in ``platforms``) plus a manifest, so ``load_exported`` can
    serve WITHOUT the model code, the checkpoint, or a re-trace. ``score``
    is exported at a fixed ``score_samples`` with an int32 seed input
    (the PRNG key is built inside the artifact); ``impute`` at a fixed
    ``impute_iters`` over the packed ``[x | mask]`` input. ``generate`` is
    not exported — its output shape is request-dependent; use a bundle.

    Returns the manifest dict. Lowering is pure client-side (no device
    needed for either platform), which is also why this works while the
    TPU is busy training.
    """
    from jax import export as jexport

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    buckets = tuple(sorted(buckets or server._buckets))
    d_in = server.spec.input_dim
    score_fn = server._raw_fns["score"]

    def score_seeded(x, seed):
        return score_fn(x, jax.random.PRNGKey(seed), score_samples)

    if impute_mode not in ("mean", "map"):
        raise ValueError(
            f"impute_mode must be 'mean' or 'map', got {impute_mode!r}"
        )
    impute_raw = server._raw_fns["impute"]

    def impute_fixed(xm):
        return impute_raw(xm, impute_iters, impute_mode == "map")

    # (fn, extra example args, input width) — impute takes the packed
    # [x | mask] array, twice the feature width.
    endpoints = {
        "encode": (server._raw_fns["encode"], (), d_in),
        "reconstruct": (server._raw_fns["reconstruct"], (), d_in),
        "score": (score_seeded, (jax.ShapeDtypeStruct((), jnp.int32),), d_in),
        "impute": (impute_fixed, (), 2 * d_in),
    }
    manifest = {
        "input_dim": d_in,
        "buckets": list(buckets),
        "score_samples": score_samples,
        "impute_iters": impute_iters,
        "impute_mode": impute_mode,
        "platforms": list(platforms),
        "artifacts": {},
    }
    for name, (fn, extra_args, width) in endpoints.items():
        jfn = jax.jit(fn)
        files = {}
        for b in buckets:
            exp = jexport.export(jfn, platforms=list(platforms))(
                jax.ShapeDtypeStruct((b, width), jnp.float32), *extra_args
            )
            fname = f"{name}_{b}.stablehlo"
            (directory / fname).write_bytes(exp.serialize())
            files[str(b)] = fname
        manifest["artifacts"][name] = files
    (directory / _EXPORT_MANIFEST).write_text(json.dumps(manifest, indent=2))
    return manifest


def load_exported(directory: str | Path) -> "ExportedServer":
    """Serve from ``export_serving`` artifacts alone (no model code)."""
    return ExportedServer(Path(directory))


class ExportedServer:
    """Batched inference over serialized-StableHLO endpoint artifacts.

    Same request contract as ``SvaeServer`` (any n ≥ 1, numpy in/out, the
    bucket-ladder batching via ``_bucketed_dispatch``), but each call
    dispatches a pre-lowered executable — nothing is traced or compiled
    from python at serving time beyond the artifact's first-use XLA
    compile, and the artifact is the only thing that has to ship.
    """

    def __init__(self, directory: str | Path):
        from jax import export as jexport

        directory = Path(directory)
        manifest = json.loads((directory / _EXPORT_MANIFEST).read_text())
        self.input_dim = int(manifest["input_dim"])
        self.score_samples = int(manifest["score_samples"])
        # Pre-impute manifests (≤ round 4) lack the key; impute() raises.
        self.impute_iters = int(manifest.get("impute_iters", 0))
        self.impute_mode = manifest.get("impute_mode", "mean")
        self._buckets = tuple(sorted(int(b) for b in manifest["buckets"]))
        self._arts = {
            name: {
                int(b): jexport.deserialize(
                    (directory / fname).read_bytes()
                )
                for b, fname in files.items()
            }
            for name, files in manifest["artifacts"].items()
        }

    def _call(self, name, x, *args):
        return self._arts[name][x.shape[0]].call(x, *args)

    def encode(self, x):
        return _bucketed_dispatch(
            self._buckets, lambda p: self._call("encode", p), x
        )

    def reconstruct(self, x):
        return _bucketed_dispatch(
            self._buckets, lambda p: self._call("reconstruct", p), x
        )

    def score(self, x, seed: int = 0):
        return _bucketed_dispatch(
            self._buckets,
            lambda p, s: self._call("score", p, s),
            x,
            jnp.asarray(seed, jnp.int32),
        )

    def cluster(self, x):
        return self.encode(x)["component"]

    def impute(self, x, mask):
        """Missing-data fill-in at the manifest's fixed iteration count
        (``impute_iters``) and decode rule (``impute_mode``); same mask
        contract as ``SvaeServer.impute``."""
        if "impute" not in self._arts:
            raise KeyError(
                "this export predates the impute endpoint — re-run "
                "export_serving to regenerate the artifacts"
            )
        return _bucketed_dispatch(
            self._buckets, lambda p: self._call("impute", p), _pack_masked(x, mask)
        )
