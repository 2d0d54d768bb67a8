"""VAE-style warmup + k-means++ reseed for the high-d SVAE configs.

The SVAE's CVI dynamics have a rich-get-richer failure mode when the
latent dimension differs from the data dimension (so component locations
cannot be seeded from data, svae_step.init_state): a freshly initialized
encoder maps every input into a small ball around the origin, the nearest
randomly-placed component absorbs all responsibility within a few CVI
steps, and the mixture collapses to one effective component for the rest
of training. Measured on the MNIST-surrogate config (latent_dim=8,
K=10): cluster purity 0.117 with 1/10 components used after 2400 steps —
chance level (runs/mnist_quality.json history; tests/test_mnist_quality_pin.py).

The classic SVAE remedy (SURVEY.md §4.5 training-recipe row) is a
two-phase recipe, implemented here TPU-first as one helper:

  1. **Warmup** — run ``steps`` ordinary SVAE train steps with ``rho=0``:
     the PGM naturals are frozen (the CVI increment is scaled by rho), so
     the nets train against a fixed broad prior — exactly a VAE with a
     mixture-shaped standard prior. Runs through the same jitted
     scan-chunked step as the main loop.
  2. **Reseed** — encode the training set, run k-means++ on the latent
     potential means (svax.pgm.init), and rebuild q's naturals as prior +
     pseudo-observations at the seeds with a covariance matched to the
     measured within-cluster spread. The increment is a valid
     sufficient-statistic bundle, so the result is a valid NIW natural by
     construction.

Measured effect on the surrogate-MNIST pin config (CPU f64, 2026-08-19):
purity 0.117 → 1.0, components used 1 → 10, with the latent k-means++
assignment itself reaching purity 1.0 after an 800-step warmup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from svax.models import svae as svae_default
from svax.models.svae import SvaeConfig
from svax.nets import mlp as nets
from svax.pgm import init as pgm_init
from svax.pgm.gmm import GmmNat
from svax.train import svae_step
from svax.train.loop import make_minibatch_scan_runner, make_scan_runner


def encoded_latent_means(
    nn_params, x: jnp.ndarray, head: str = "diag"
) -> jnp.ndarray:
    """Latent-space means implied by the encoder's Gaussian potentials.

    The encoder emits information-form potentials h = J·m with J diagonal
    (``head="diag"``: mean = h / J) or full (``head="full"``: mean =
    J⁻¹h). (N, input_dim) → (N, latent_dim).
    """
    pot_h, pot_prec = nets.encoder_apply(nn_params["encoder"], x, head=head)
    if pot_prec.ndim == pot_h.ndim + 1:
        return jnp.linalg.solve(pot_prec, pot_h[..., None])[..., 0]
    return pot_h / pot_prec


def reseed_from_encoder(
    state,
    x: jnp.ndarray,
    prior: GmmNat,
    *,
    seed: int = 0,
    pseudo_counts: float = 5.0,
    cov_scale: float = 0.0,
    max_points: int = 20000,
    reset_step: bool = True,
    head: str = "diag",
):
    """Replace q's naturals with k-means++ seeds in the CURRENT latent space.

    ``cov_scale=0`` (auto) uses the measured within-cluster per-dimension
    variance of the k-means++ assignment (floored at 1e-3) so the seeded
    components start tight enough not to merge. ``reset_step`` zeroes the
    trainer's step counter so a decaying rho schedule restarts from rho_0
    for the joint phase (Adam's bias-correction count lives in opt_state
    and is deliberately left alone).

    Returns ``(state, info)`` with the seeds' diagnostics.
    """
    k = prior.dir_nat.shape[0]
    lat = np.asarray(
        jax.device_get(
            encoded_latent_means(state.nn_params, x[:max_points], head=head)
        ),
        dtype=np.float64,
    )
    centers = pgm_init.kmeanspp_centers(lat, k, seed=seed)
    d2 = ((lat[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    assign = np.argmin(d2, axis=-1)
    within = float(np.mean((lat - centers[assign]) ** 2))
    scale = cov_scale if cov_scale > 0.0 else max(within, 1e-3)
    pgm_nat = pgm_init.init_variational_kmeanspp(
        prior, lat, seed=seed, pseudo_counts=pseudo_counts, cov_scale=scale
    )
    new_state = state._replace(pgm_nat=pgm_nat)
    if reset_step and hasattr(state, "step"):
        new_state = new_state._replace(step=jnp.zeros_like(state.step))
    info = {
        "within_cluster_var": within,
        "cov_scale": scale,
        "seed_occupancy": int(np.unique(assign).size),
    }
    return new_state, info


def vae_warmup_reseed(
    state,
    x: jnp.ndarray,
    config: SvaeConfig,
    prior: GmmNat,
    optimizer,
    key: jax.Array,
    *,
    steps: int = 1000,
    batch_size: int = 0,
    scan_chunk: int = 100,
    model=svae_default,
    pseudo_counts: float = 5.0,
    cov_scale: float = 0.0,
    seed: int = 0,
):
    """Phase-1 warmup (rho=0) then k-means++ reseed; returns (state, info).

    ``batch_size=0`` trains full-batch. The warmup runs on the XLA scan
    path regardless of the main loop's engine — it is a one-off costing
    ``steps`` ordinary step times, after which any engine (including the
    megakernels) continues from the reseeded state.
    """
    head = getattr(config, "encoder_head", "diag")
    if steps <= 0:
        return reseed_from_encoder(
            state, x, prior, seed=seed,
            pseudo_counts=pseudo_counts, cov_scale=cov_scale, head=head,
        )
    n = x.shape[0]
    batch = batch_size or n
    step = svae_step.make_train_step(
        config, prior, optimizer, rho=0.0, model=model
    )
    chunk = min(scan_chunk, steps)
    done = 0
    if batch >= n:
        runner = make_scan_runner(step, chunk)
        while done < steps:
            todo = min(chunk, steps - done)
            if todo != chunk:
                runner = make_scan_runner(step, todo)
            key, k_chunk = jax.random.split(key)
            state, _ = runner(state, x, k_chunk)
            done += todo
    else:
        runner = make_minibatch_scan_runner(step, chunk)
        while done < steps:
            todo = min(chunk, steps - done)
            if todo != chunk:
                runner = make_minibatch_scan_runner(step, todo)
            key, kb, k_chunk = jax.random.split(key, 3)
            idx = jax.random.randint(kb, (todo, batch), 0, n)
            state, _ = runner(state, x[idx], k_chunk)
            done += todo
    return reseed_from_encoder(
        state, x, prior, seed=seed,
        pseudo_counts=pseudo_counts, cov_scale=cov_scale, head=head,
    )
