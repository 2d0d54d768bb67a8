"""Cluster / latent-space visualization (SURVEY.md §3a "Visualization").

Matplotlib renderings of the classic SVAE figures: data scatter colored by
responsibility, per-component covariance ellipses from the expected NIW
parameters, and training curves from JSONL logs. Import of matplotlib is
deferred so headless training runs never pay for it.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _ellipse_points(mean: np.ndarray, cov: np.ndarray, n_std: float = 2.0, n: int = 64):
    theta = np.linspace(0, 2 * np.pi, n)
    circle = np.stack([np.cos(theta), np.sin(theta)], axis=0)
    vals, vecs = np.linalg.eigh(cov)
    radii = n_std * np.sqrt(np.maximum(vals, 0.0))
    return (vecs @ (radii[:, None] * circle)).T + mean


def plot_gmm_clusters(
    x: np.ndarray,
    resp: np.ndarray,
    nat,
    path: str | Path | None,
    title: str = "",
    min_weight: float = 0.01,
    ax=None,
) -> None:
    """Scatter of 2-D data colored by argmax responsibility + NIW ellipses.

    ``nat`` is a GmmNat; component ellipses use E[μ] = m and the expected
    covariance E[Σ] = Φ/(ν − d − 1) of the NIW posterior. With ``ax``
    given, draws into that axes (caller owns the figure; ``path`` ignored).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from svax.expfam import niw as niw_mod

    std = niw_mod.natural_to_standard(nat.niw_nat)
    m = np.asarray(std.m)
    phi = np.asarray(std.phi)
    nu = np.asarray(std.nu)
    d = m.shape[-1]
    if d > 2:
        # Project to the first two latent axes (marginal covariances).
        x = np.asarray(x)[:, :2]
        m = m[:, :2]
        phi = phi[:, :2, :2]
    weights = np.asarray(resp).sum(0)
    weights = weights / weights.sum()

    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(figsize=(6, 6))
    hard = np.asarray(resp).argmax(-1)
    cmap = plt.get_cmap("tab10")
    ax.scatter(x[:, 0], x[:, 1], c=[cmap(h % 10) for h in hard], s=8, alpha=0.6)
    for j in range(m.shape[0]):
        if weights[j] < min_weight:
            continue
        denom = max(nu[j] - d - 1.0, 0.1)
        cov = phi[j] / denom
        pts = _ellipse_points(m[j], cov)
        ax.plot(pts[:, 0], pts[:, 1], color=cmap(j % 10), lw=1.5)
        ax.scatter(*m[j], marker="x", color=cmap(j % 10), s=60)
    ax.set_title(title or "GMM clusters")
    ax.set_aspect("equal")
    if own_fig:
        fig.tight_layout()
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(path, dpi=120)
        plt.close(fig)


def plot_latent_space(
    z_mean: np.ndarray, resp: np.ndarray, nat, path: str | Path | None,
    title: str = "", ax=None,
) -> None:
    """Latent scatter (posterior means, responsibility-weighted) + ellipses."""
    plot_gmm_clusters(z_mean, resp, nat, path, title=title or "latent space", ax=ax)


def plot_training_curves(jsonl_path: str | Path, path: str | Path, keys=("elbo",)) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from svax.train.metrics import read_jsonl

    rows = read_jsonl(jsonl_path)
    fig, ax = plt.subplots(figsize=(7, 4))
    for k in keys:
        xs = [r["step"] for r in rows if k in r]
        ys = [r[k] for r in rows if k in r]
        if xs:
            ax.plot(xs, ys, label=k)
    ax.set_xlabel("step")
    ax.legend()
    fig.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
