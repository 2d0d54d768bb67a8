#!/usr/bin/env python
"""Multi-seed DEFAULT-vs-HIGHEST quality A/B for the flexstep megakernel.

The round-3 claim that single-pass bf16 (DEFAULT) dots are quality-neutral
for the auto-svae config rested on ONE same-seed A/B (best test ELBO
−12.313 vs −12.313 — BASELINE.md row #3); the pinwheel kernel needed
HIGHEST for parity-class behavior, so precision sensitivity is
shape-dependent and one seed is thin support for the pinned
``engine="auto"`` default (VERDICT r3 weak item 5 / task 6).

This trains the FULL auto-svae config through the flexstep megakernel
(SvaeTrainer, engine="megakernel") at both dot precisions for N seeds,
tracking best held-out ELBO per run, and writes
``runs/flexstep_quality_ab.json`` with per-seed bests + the paired
deltas. The precision policy for ``engine="auto"`` is gated on this
evidence (BASELINE.md row #3).

Usage: python benchmarks/flexstep_quality_ab.py [--seeds 8] [--steps 10000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--out", default="runs/flexstep_quality_ab.json")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from configs import CONFIGS
    from svax.data import load_dataset
    from svax.models.svae import SvaeConfig
    from svax.train.trainer import SvaeTrainer, TrainerConfig

    cfg = CONFIGS["auto-svae"]
    train, test, meta = load_dataset("auto", seed=0)
    x = jnp.asarray(train, jnp.float32)
    xt = jnp.asarray(test, jnp.float32)

    precisions = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }
    rows: dict = {name: [] for name in precisions}
    for seed in range(args.seeds):
        for name, prec in precisions.items():
            mc = SvaeConfig(
                latent_dim=cfg["latent_dim"],
                num_components=cfg["num_components"],
                num_samples=cfg["num_samples"],
                likelihood=meta["likelihood"],
                num_total=x.shape[0],
                nn_precision=prec,
            )
            tc = TrainerConfig(
                steps=args.steps, batch_size=cfg["batch_size"],
                lr=cfg["lr"], rho=cfg["rho"], rho_decay=cfg["rho_decay"],
                eval_every=args.eval_every, scan_chunk=args.eval_every,
                seed=seed,
                encoder_hidden=tuple(cfg["encoder_hidden"]),
                decoder_hidden=tuple(cfg["decoder_hidden"]),
                engine="megakernel",
            )
            trainer = SvaeTrainer(mc, tc, input_dim=x.shape[1])
            t0 = time.perf_counter()
            trainer.fit(x, xt)
            best = trainer.best
            rows[name].append({
                "seed": seed,
                "best_test_elbo_per_point": round(best["best_value"], 4),
                "best_step": best["best_step"],
                "wall_s": round(time.perf_counter() - t0, 1),
            })
            print(f"[seed {seed} {name}] best {best['best_value']:.4f} "
                  f"at step {best['best_step']}", flush=True)

    deltas = [
        round(h["best_test_elbo_per_point"] - d["best_test_elbo_per_point"], 4)
        for h, d in zip(rows["highest"], rows["default"])
    ]
    import statistics

    summary = {
        "config": "auto-svae (flexstep megakernel, full shipped budget)",
        "steps": args.steps,
        "synthetic_data": bool(meta.get("synthetic", False)),
        "per_seed": rows,
        "highest_minus_default_per_seed": deltas,
        "delta_mean": round(statistics.mean(deltas), 4),
        "delta_stdev": round(statistics.stdev(deltas), 4) if len(deltas) > 1 else 0.0,
        "best_mean": {
            name: round(statistics.mean(
                r["best_test_elbo_per_point"] for r in rs), 4)
            for name, rs in rows.items()
        },
    }
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(summary, indent=1))
    print(json.dumps({k: v for k, v in summary.items() if k != "per_seed"}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
