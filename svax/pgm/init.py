"""Initialization strategies for the mixture globals (SURVEY.md §3a init).

Beyond the random-pseudo-observation init in ``gmm.init_variational``, this
module adds k-means++ seeding: component locations are chosen by the
classic D² sampling rule, which substantially reduces the dead-component
rate at large K (the BASELINE config #5 regime). Pure numpy — runs once on
the host before training.
"""

from __future__ import annotations

import numpy as np

from svax.pgm import gmm
from svax.pgm.gmm import GmmNat


def kmeanspp_centers(x: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """k-means++ (D² weighting) center selection; x (N, d) → (k, d)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x)
    n = x.shape[0]
    centers = [x[rng.integers(n)]]
    d2 = np.sum((x - centers[0]) ** 2, axis=-1)
    for _ in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centers.append(x[rng.choice(n, p=probs)])
        d2 = np.minimum(d2, np.sum((x - centers[-1]) ** 2, axis=-1))
    return np.stack(centers)


def init_variational_kmeanspp(
    prior: GmmNat,
    data: np.ndarray,
    seed: int = 0,
    pseudo_counts: float = 2.0,
    cov_scale: float = 1.0,
) -> GmmNat:
    """Prior + pseudo-observations centered at k-means++ seeds.

    Same valid-by-construction property as ``gmm.init_variational``: the
    increment is a legitimate sufficient-statistic bundle, so the result is
    always a valid NIW natural parameter.
    """
    import jax
    import jax.numpy as jnp

    from svax.expfam.niw import NiwNat

    k = prior.dir_nat.shape[0]
    d = prior.niw_nat.eta1.shape[-1]
    locs = kmeanspp_centers(np.asarray(data), k, seed=seed).astype(
        np.dtype(prior.niw_nat.eta1.dtype.name)
    )
    c = pseudo_counts
    outer = locs[:, :, None] * locs[:, None, :]
    eye = cov_scale * np.eye(d, dtype=locs.dtype)
    inc = NiwNat(
        eta1=jnp.asarray(c * locs),
        eta2=jnp.full((k,), c, dtype=prior.niw_nat.eta2.dtype),
        eta3=jnp.asarray(c * (outer + eye)),
        eta4=jnp.full((k,), c, dtype=prior.niw_nat.eta4.dtype),
    )
    return gmm.GmmNat(
        dir_nat=prior.dir_nat + c,
        niw_nat=jax.tree.map(jnp.add, prior.niw_nat, inc),
    )
