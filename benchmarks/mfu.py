#!/usr/bin/env python
"""MFU / roofline accounting for the SVAE step (VERDICT r1 #3).

For a given config shape this compiles the full train step, pulls XLA's
cost analysis (logical FLOPs + HBM bytes accessed), measures the steady-
state step time in scan chunks, and reports:

  * logical TFLOP/s and GB/s achieved,
  * MFU vs the chip's bf16 matmul peak (plus the precision-pass-adjusted
    hardware utilization: Precision.HIGH runs bf16x3 passes, HIGHEST
    bf16x6, so the MXU does 3x/6x the logical matmul work),
  * the roofline verdict: which resource binds at this arithmetic
    intensity.

Run on TPU:  python benchmarks/mfu.py [--config bigk|mnist]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# TPU v5e (single chip): 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM.
PEAK_FLOPS = {"tpu v5e": 197e12, "tpu v5 lite": 197e12}
PEAK_HBM = {"tpu v5e": 819e9, "tpu v5 lite": 819e9}
DEFAULT_PEAK_FLOPS = 197e12
DEFAULT_PEAK_HBM = 819e9


def _chip_peaks():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for name, val in PEAK_FLOPS.items():
        if name in kind:
            return val, PEAK_HBM[name], kind
    return DEFAULT_PEAK_FLOPS, DEFAULT_PEAK_HBM, kind


def analyze(name: str, k: int, d: int, s: int, hidden, batch: int,
            input_dim: int = 784, likelihood: str = "bernoulli",
            chunk: int = 20, n_chunks: int = 4, remat: bool = False,
            precision: str = "high", fused_decoder: bool = False,
            compute_dtype: str = "float32", recon_mode: str = "weighted",
            fused_combine: bool = False, fused_mlp_decoder: bool = False,
            kernel_rng: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from svax.models.svae import SvaeConfig
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import make_scan_runner

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    config = SvaeConfig(
        latent_dim=d, num_components=k, num_samples=s, likelihood=likelihood,
        num_total=batch, nn_precision=prec, remat_combine=remat,
        fused_decoder=fused_decoder, nn_compute_dtype=compute_dtype,
        recon_mode=recon_mode, fused_combine=fused_combine,
        fused_mlp_decoder=fused_mlp_decoder, kernel_rng=kernel_rng,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.random((batch, input_dim)) > 0.7).astype(np.float32)
        if likelihood == "bernoulli"
        else rng.standard_normal((batch, input_dim)).astype(np.float32)
    )
    prior = gmm.make_prior(k, d)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    state = svae_step.init_state(key, input_dim, config, prior, opt,
                                 tuple(hidden), tuple(hidden), data=x)
    step = svae_step.make_train_step(config, prior, opt, rho=0.1)

    def _cost(step_fn):
        ca = jax.jit(step_fn).lower(state, x, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        # XLA reports bytes accessed{} split over operands; 'bytes accessed'
        # is the total when present, else sum the operand entries.
        ba = float(ca.get("bytes accessed", 0.0))
        if ba == 0.0:
            ba = sum(v for key_, v in ca.items()
                     if key_.startswith("bytes accessed") and isinstance(v, float))
        return fl, ba

    # Cost analysis of ONE step (not the scan): logical flops + HBM traffic.
    flops, bytes_acc = _cost(step)
    flops_src = "xla"
    if fused_combine or fused_mlp_decoder:
        # XLA's cost model cannot see inside Pallas custom calls, so FLOPs
        # for the fused step come from the mathematically identical unfused
        # lowering (fusion does not change logical FLOPs). bytes_acc keeps
        # the fused step's own figure (that IS the point of fusion), which
        # still excludes kernel-internal VMEM traffic by construction.
        ref_cfg = config._replace(fused_combine=False, fused_mlp_decoder=False)
        ref_step = svae_step.make_train_step(ref_cfg, prior, opt, rho=0.1)
        flops, _ = _cost(ref_step)
        flops_src = "xla-unfused-equivalent"

    # Paired-chunk timing: a scan of `chunk` steps and one of `2*chunk`
    # steps each pay the same fixed per-launch cost (dispatch + the scalar
    # host-read sync, a full tunnel round-trip ~25 ms out here); their
    # difference is `chunk` steps of pure on-device time. block_until_ready
    # alone is NOT a safe barrier through the tunnel (see bench.py).
    def _median_time(c):
        r = make_scan_runner(step, c)
        st, _ = r(state, x, key)  # warm compile
        float(st.pgm_nat.dir_nat.ravel()[0])
        ts = []
        for i in range(n_chunks):
            t0 = time.perf_counter()
            st, m = r(st, x, jax.random.fold_in(key, i))
            float(st.pgm_nat.dir_nat.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), m

    t1, _ = _median_time(chunk)
    t2, m = _median_time(2 * chunk)
    dt = (t2 - t1) / chunk
    timing_suspect = False
    if dt <= 0.0:
        # Tunnel-RTT jitter swamped the pairing (t2 ≤ t1 would yield a
        # nonsensical negative per-step time, negative TFLOPs, and a
        # bogus roofline verdict). Fall back to the conservative
        # single-chunk rate and say so in the JSON.
        timing_suspect = True
        dt = t1 / chunk

    peak_flops, peak_hbm, kind = _chip_peaks()
    tflops = flops / dt
    gbs = bytes_acc / dt
    intensity = flops / max(bytes_acc, 1.0)
    ridge = peak_flops / peak_hbm  # flops/byte where compute starts to bind
    mult = {"highest": 6, "high": 3, "default": 1}[precision]
    row = {
        "config": name,
        "device": kind,
        "ms_per_step": round(dt * 1e3, 3),
        "steps_per_sec": round(1.0 / dt, 1),
        "logical_gflops_per_step": round(flops / 1e9, 2),
        "hbm_gb_per_step": round(bytes_acc / 1e9, 4),
        "achieved_tflops": round(tflops / 1e12, 2),
        "achieved_hbm_gbs": round(gbs / 1e9, 1),
        "mfu_logical_pct": round(100 * tflops / peak_flops, 2),
        "mxu_util_precision_adj_pct": round(100 * mult * tflops / peak_flops, 2),
        "hbm_util_pct": round(100 * gbs / peak_hbm, 2),
        "arith_intensity_flops_per_byte": round(intensity, 1),
        "ridge_point": round(ridge, 1),
        "bound": "compute" if intensity > ridge else "memory",
        "timing_suspect": timing_suspect,
        "flops_source": flops_src,
        "remat": remat,
        "fused_decoder": fused_decoder,
        "precision": precision,
        "compute_dtype": compute_dtype,
        "recon_mode": recon_mode,
        "fused_combine": fused_combine,
        "fused_mlp_decoder": fused_mlp_decoder,
        "elbo_finite": bool(jnp.isfinite(m["elbo"][-1])),
        "final_elbo": float(m["elbo"][-1]),
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=["bigk", "mnist", "both"], default="both")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--fused-decoder", action="store_true")
    p.add_argument("--precision", choices=["highest", "high", "default"],
                   default="high")
    p.add_argument("--fused-mlp-decoder", action="store_true")
    p.add_argument("--kernel-rng", action="store_true",
                   help="generate eps inside the fused combine kernel "
                        "(hardware PRNG; drops the threefry op + HBM "
                        "round-trip)")
    p.add_argument("--fused-combine", action="store_true",
                   help="route the SIN combine through the fused Pallas "
                        "kernel (svax.ops.combine_pallas)")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="decoder-body compute dtype (bfloat16 halves the "
                        "dominant HBM streams; see SvaeConfig)")
    args = p.parse_args()
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    if args.config in ("bigk", "both"):
        analyze("bigk-single-chip", k=100, d=10, s=1, hidden=(200, 200),
                batch=1024, chunk=100,
                remat=args.remat, precision=args.precision,
                fused_decoder=args.fused_decoder,
                compute_dtype=args.compute_dtype,
                fused_combine=args.fused_combine,
                fused_mlp_decoder=args.fused_mlp_decoder,
                kernel_rng=args.kernel_rng)
    if args.config in ("mnist", "both"):
        analyze("mnist-svae", k=10, d=8, s=1, hidden=(200, 200), batch=256,
                chunk=200, remat=args.remat, precision=args.precision,
                fused_decoder=args.fused_decoder,
                compute_dtype=args.compute_dtype,
                fused_combine=args.fused_combine,
                fused_mlp_decoder=args.fused_mlp_decoder,
                kernel_rng=args.kernel_rng)


if __name__ == "__main__":
    main()
