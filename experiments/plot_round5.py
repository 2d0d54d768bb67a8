"""Render the round-5 evidence figures from committed artifacts.

Reads runs/comparison.json (paired-seed three-model comparison, SURVEY §1's
central table) and runs/impute_quality.json (serve-endpoint imputation
quality, VERDICT r4 weak #4) and writes two PNGs into docs/figures/:

- comparison_paired.png — per-seed paired deltas (SVAE − VAE held-out IW)
  per dataset, with mean ± sem and the win count. Shows the honest round-5
  verdicts: pinwheel per-seed wins are even (16/32) but the mean favors
  the VAE via the SVAE's collapse tail; auto and mnist are decisive SVAE
  wins (8/8 each).
- impute_quality.png — impute-endpoint quality vs mean-fill and a
  matched-budget VAE on the mnist surrogate (masked-pixel NLL + bit error;
  the endpoint's value case) and pinwheel hide-one-coordinate RMSE (the
  documented honest negative — no deterministic fill beats the marginal).
- seed_distributions.png — the round-5 32-seed canonical sweeps (best-of-2
  vs best-of-5 vs the exact pure-GMM bar) and the 32-redraw per-draw
  IW-minus-bar gaps: the bimodality/tail story behind every crossing
  claim, from runs/seed_sweep_r5_mega_{default32,rs5_32}.json and
  runs/seed_sweep_r5_redraw_rs5_32.json.

Pure matplotlib on committed JSON; no jax, no device, deterministic.

Usage:
    python experiments/plot_round5.py [--out-dir docs/figures]
"""

from __future__ import annotations

import argparse
import json
import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# Validated 3-slot categorical palette (all-pairs safe, light mode) +
# light-surface text/grid tokens.
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e8e7e4"
BLUE = "#2a78d6"   # slot 1: SVAE / the paired deltas
ORANGE = "#eb6834"  # slot 2: VAE
AQUA = "#1baf7a"   # slot 3: mean-fill baseline

DATASET_LABEL = {
    "pinwheel": "pinwheel (real generator)",
    "auto": "auto (surrogate)",
    "mnist": "mnist (surrogate)",
}


def _style_axis(ax):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=8)
    for lab in ax.get_xticklabels() + ax.get_yticklabels():
        lab.set_color(INK2)


def plot_comparison(comparison: dict, out: pathlib.Path) -> None:
    datasets = [d for d in ("pinwheel", "auto", "mnist") if d in comparison]
    fig, axes = plt.subplots(
        len(datasets), 1, figsize=(6.4, 1.55 * len(datasets)), dpi=160
    )
    fig.patch.set_facecolor(SURFACE)
    if len(datasets) == 1:
        axes = [axes]
    rng = np.random.default_rng(0)  # jitter only; data order is committed
    for ax, ds in zip(axes, datasets):
        row = comparison[ds]
        deltas = np.array(
            [
                s["iw_best"] - v["iw_best"]
                for s, v in zip(row["svae"]["per_seed"], row["vae"]["per_seed"])
            ]
        )
        pd = row["paired_delta"]
        _style_axis(ax)
        ax.axvline(0.0, color=INK2, lw=1.0, zorder=1)
        jitter = rng.uniform(-0.18, 0.18, size=deltas.shape)
        ax.scatter(
            deltas,
            jitter,
            s=34,
            color=BLUE,
            edgecolors=SURFACE,
            linewidths=1.2,
            zorder=3,
        )
        ax.errorbar(
            pd["mean"],
            -0.42,
            xerr=pd["sem"],
            fmt="o",
            ms=6,
            color=INK,
            ecolor=INK,
            elinewidth=2.0,
            capsize=3,
            zorder=4,
        )
        sig = "significant" if row.get("svae_beats_vae_significant") else (
            "VAE favored" if pd["mean"] < 0 else "within noise"
        )
        ax.text(
            0.99,
            0.94,
            f"mean Δ = {pd['mean']:+.3f} ± {pd['sem']:.3f} (sem)   "
            f"SVAE wins {pd['wins']}   [{sig}]",
            transform=ax.transAxes,
            ha="right",
            va="top",
            fontsize=8,
            color=INK2,
        )
        ax.set_ylabel(
            f"{DATASET_LABEL.get(ds, ds)}\n{row['seeds']} paired seeds",
            fontsize=8,
            color=INK,
        )
        ax.set_yticks([])
        ax.set_ylim(-0.62, 0.62)
        lim = max(abs(deltas).max(), abs(pd["mean"]) + pd["sem"]) * 1.18
        ax.set_xlim(-lim, lim)
    axes[-1].set_xlabel(
        "paired per-seed Δ held-out IW log-lik  (SVAE − VAE;  > 0 favors SVAE)",
        fontsize=8.5,
        color=INK,
    )
    axes[0].set_title(
        "Three-dataset paired comparison (runs/comparison.json, matched budgets)",
        fontsize=9.5,
        color=INK,
        loc="left",
    )
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE, bbox_inches="tight")
    plt.close(fig)


def _bars(ax, labels, values, colors, unit, fmt="{:.3f}"):
    _style_axis(ax)
    x = np.arange(len(values))
    ax.bar(x, values, width=0.55, color=colors, zorder=3)
    for xi, v in zip(x, values):
        ax.text(
            xi,
            v,
            " " + fmt.format(v),
            ha="center",
            va="bottom",
            fontsize=7.5,
            color=INK,
        )
    ax.set_xticks(x)
    ax.set_xticklabels(labels, fontsize=7.5, color=INK)
    ax.set_ylabel(unit, fontsize=8, color=INK)
    ax.grid(axis="y", color=GRID, lw=0.8, zorder=0)
    ax.set_axisbelow(True)
    ax.margins(y=0.18)


def plot_impute(iq: dict, out: pathlib.Path) -> None:
    fig, axes = plt.subplots(1, 3, figsize=(9.2, 2.7), dpi=160)
    fig.patch.set_facecolor(SURFACE)

    m = iq["mnist"]
    _bars(
        axes[0],
        ["SVAE", "VAE", "mean-fill"],
        [m["masked_pixel_nll"]["svae_live"], m["masked_pixel_nll"]["vae"],
         m["masked_pixel_nll"]["mean_fill"]],
        [BLUE, ORANGE, AQUA],
        "masked-pixel NLL (nats/px, ↓)",
    )
    axes[0].set_title(
        "mnist (surrogate), 50% pixel mask", fontsize=8.5, color=INK, loc="left"
    )

    _bars(
        axes[1],
        ["SVAE", "VAE", "mean-fill"],
        [m["masked_pixel_err"]["svae_live"], m["masked_pixel_err"]["vae"],
         m["masked_pixel_err"]["mean_fill"]],
        [BLUE, ORANGE, AQUA],
        "masked-pixel bit error (↓)",
    )
    axes[1].set_title(
        "mnist (surrogate), 50% pixel mask", fontsize=8.5, color=INK, loc="left"
    )

    p = iq["pinwheel"]
    _bars(
        axes[2],
        ["SVAE\n(MAP)", "VAE", "mean-fill"],
        [p["rmse"]["svae_map"], p["rmse"]["vae"], p["rmse"]["mean_fill"]],
        [BLUE, ORANGE, AQUA],
        "hidden-coordinate RMSE (↓)",
        fmt="{:.2f}",
    )
    axes[2].set_title(
        "pinwheel, hide-one-coordinate\n(ambiguous by construction — honest negative)",
        fontsize=8.5,
        color=INK,
        loc="left",
    )

    fig.suptitle(
        "Serve `impute` endpoint quality (runs/impute_quality.json; AOT tier "
        "bit-identical to live)",
        fontsize=9.5,
        color=INK,
        x=0.01,
        ha="left",
    )
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    fig.savefig(out, facecolor=SURFACE, bbox_inches="tight")
    plt.close(fig)


def plot_seed_distributions(canon2: dict, canon5: dict, redraw: dict,
                            out: pathlib.Path) -> None:
    fig, axes = plt.subplots(2, 1, figsize=(6.4, 3.6), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    rng = np.random.default_rng(0)  # jitter only; data order is committed

    # Canonical protocol: 32 model seeds on the fixed seed-0 draw.
    ax = axes[0]
    _style_axis(ax)
    bar = canon2["results"]["aug0.4+rs2"]["rows"][0]["gmm_bar"]
    ax.axvline(bar, color=INK, lw=1.2, zorder=2)
    ax.text(bar, 1.52, f" exact-GMM bar {bar:.2f}", fontsize=7.5,
            color=INK, ha="left", va="top")
    for y, (label, blob, color) in enumerate([
        ("best-of-2", canon2["results"]["aug0.4+rs2"], ORANGE),
        ("best-of-5", canon5["results"]["aug0.4+rs5"], BLUE),
    ]):
        iw = np.array([r["iw_per_point"] for r in blob["rows"]])
        cross = int(sum(r["crossed"] for r in blob["rows"]))
        jitter = rng.uniform(-0.16, 0.16, size=iw.shape)
        ax.scatter(iw, y + jitter, s=26, color=color, edgecolors=SURFACE,
                   linewidths=1.0, zorder=3)
        ax.plot([np.median(iw)] * 2, [y - 0.26, y + 0.26], color=INK,
                lw=2.0, zorder=4)
        ax.text(0.01, 0.32 + 0.46 * y,
                f"{label}: median {np.median(iw):.2f}, {cross}/{len(iw)} cross",
                transform=ax.transAxes, ha="left", va="center", fontsize=8,
                color=color)
    ax.set_yticks([0, 1])
    ax.set_yticklabels(["rs2", "rs5"], fontsize=8, color=INK)
    ax.set_ylim(-0.55, 1.55)
    ax.set_title("Canonical protocol, 32 model seeds (megakernel engine): "
                 "held-out IW/point", fontsize=9, color=INK, loc="left")

    # Redraw protocol: 32 fresh data draws, per-draw bars.
    ax = axes[1]
    _style_axis(ax)
    rows = redraw["results"]["aug0.6+rs5+steps30000"]["rows"]
    gap = np.array([r["iw_per_point"] - r["gmm_bar"] for r in rows])
    cross = int(sum(r["crossed"] for r in rows))
    ax.axvline(0.0, color=INK, lw=1.2, zorder=2)
    jitter = rng.uniform(-0.16, 0.16, size=gap.shape)
    ax.scatter(gap, jitter, s=26, color=AQUA, edgecolors=SURFACE,
               linewidths=1.0, zorder=3)
    ax.plot([np.median(gap)] * 2, [-0.26, 0.26], color=INK, lw=2.0, zorder=4)
    ax.text(0.99, 0.88,
            f"median gap {np.median(gap):+.3f} nat, {cross}/{len(gap)} cross",
            transform=ax.transAxes, ha="right", va="top", fontsize=8,
            color=INK2)
    ax.set_yticks([])
    ax.set_ylim(-0.55, 0.55)
    ax.set_xlabel("IW/point − per-draw exact-GMM bar  (> 0 = crosses)",
                  fontsize=8.5, color=INK)
    ax.set_title("Redraw protocol, 32 fresh draws (best-of-5): gap to each "
                 "draw's own bar", fontsize=9, color=INK, loc="left")

    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE, bbox_inches="tight")
    plt.close(fig)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="docs/figures")
    ap.add_argument("--runs-dir", default="runs")
    args = ap.parse_args()
    runs = pathlib.Path(args.runs_dir)
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    comparison = json.loads((runs / "comparison.json").read_text())
    plot_comparison(comparison, out_dir / "comparison_paired.png")
    print(f"wrote {out_dir / 'comparison_paired.png'}")

    iq = json.loads((runs / "impute_quality.json").read_text())
    plot_impute(iq, out_dir / "impute_quality.png")
    print(f"wrote {out_dir / 'impute_quality.png'}")

    canon2 = json.loads(
        (runs / "seed_sweep_r5_mega_default32.json").read_text())
    canon5 = json.loads((runs / "seed_sweep_r5_mega_rs5_32.json").read_text())
    redraw = json.loads(
        (runs / "seed_sweep_r5_redraw_rs5_32.json").read_text())
    plot_seed_distributions(canon2, canon5, redraw,
                            out_dir / "seed_distributions.png")
    print(f"wrote {out_dir / 'seed_distributions.png'}")


if __name__ == "__main__":
    main()
