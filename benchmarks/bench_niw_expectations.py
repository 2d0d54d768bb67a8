#!/usr/bin/env python
"""Batched NIW expectation map: is a Pallas kernel warranted? (SURVEY §3b)

Measures the K-batched expected-statistics computation (Cholesky of Φ,
solves, log-det, digamma sums) for the BASELINE config shapes. SURVEY.md §8
step 4 says: benchmark vs XLA-only and keep only kernels that win — this
records the evidence for that decision.

Run:  python benchmarks/bench_niw_expectations.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from svax.expfam import niw
    from svax.pgm import gmm

    print(f"backend={jax.default_backend()}", flush=True)
    for k, d in [(10, 2), (10, 8), (100, 10), (1000, 10)]:
        prior = gmm.make_prior(k, d)
        nat = gmm.init_variational(jax.random.PRNGKey(0), prior)

        fn = jax.jit(lambda n: niw.expected_stats_nat(n))
        out = fn(nat.niw_nat)
        jax.block_until_ready(out.logdet)
        reps = 200
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(nat.niw_nat)
        jax.block_until_ready(out.logdet)
        dt = (time.perf_counter() - t0) / reps
        print(
            json.dumps(
                {"K": k, "d": d, "us_per_call": round(dt * 1e6, 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
