#!/usr/bin/env python
"""Train the structured VAE (SVAE) with VMP/CVI natural-gradient updates.

BASELINE.json configs #1 (pinwheel), #3 (Auto), #4 (MNIST). The step
alternates (inside ONE jitted function) an Adam update on the neural nets
with a CVI natural-gradient update on the GMM prior naturals — SURVEY.md
§4.1's call stack rebuilt TPU-first.

Examples:
    python experiments/train_svae.py --dataset pinwheel --steps 2000
    python experiments/train_svae.py --dataset auto -K 10 --latent-dim 4
    python experiments/train_svae.py --dataset mnist -K 10 --latent-dim 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", choices=["pinwheel-svae", "auto-svae", "mnist-svae", "bigk-dp"], default="")
    p.add_argument("--dataset", choices=["pinwheel", "auto", "mnist"], default="pinwheel")
    p.add_argument("--num-components", "-K", type=int, default=10)
    p.add_argument("--latent-dim", "-L", type=int, default=2)
    p.add_argument("--num-samples", "-S", type=int, default=4)
    p.add_argument("--encoder-hidden", type=int, nargs="+", default=[50, 50])
    p.add_argument("--decoder-hidden", type=int, nargs="+", default=[50, 50])
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=0, help="0 = full batch")
    p.add_argument("--lr", type=float, default=1e-3, help="Adam lr for NN params")
    p.add_argument("--aug-noise", type=float, default=0.0,
                   help="input-noise augmentation sigma: each train step "
                        "sees x + sigma*N(0,I). The seed-robustness lever "
                        "for the tiny pinwheel set (BASELINE.md seed "
                        "table); 0 disables")
    p.add_argument("--weight-decay", type=float, default=0.0,
                   help="AdamW decoupled weight decay on the NN params")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="VAE-style warmup: N steps with the PGM frozen "
                        "(rho=0), then k-means++ reseed of the components "
                        "from the encoded latent means. The anti-collapse "
                        "recipe for latent_dim != input_dim configs "
                        "(svax/train/warmup.py; purity 0.117 -> 1.0 on "
                        "the MNIST surrogate)")
    p.add_argument("--rho", type=float, default=0.05, help="CVI step size")
    p.add_argument("--rho-decay", type=float, default=0.0)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--kappa", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--scan-chunk", type=int, default=0,
                   help="run N steps per device-resident lax.scan chunk "
                        "(0 = per-step dispatch; big speedup on TPU)")
    p.add_argument("--iw-samples", type=int, default=100,
                   help="importance-weighted final test log-lik samples (0=off)")
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    p.add_argument("--plot", type=str, default="", help="write cluster plot PNG here")
    p.add_argument("--logfile", type=str, default="")
    p.add_argument("--checkpoint-dir", type=str, default="")
    p.add_argument("--bundle-dir", type=str, default="",
                   help="write a self-describing serving bundle here at the "
                        "end of training (svax.serve.load_bundle restores "
                        "it with zero flags)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise on first NaN (jax_debug_nans)")
    p.add_argument("--nn-precision", choices=["highest", "high", "default"],
                   default="high",
                   help="MXU precision for the nets: highest=f32 (6 bf16 "
                        "passes), high=bf16x3 (~1e-7 rel error, default), "
                        "default=single-pass bf16")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the SIN combine (large batch/K memory)")
    p.add_argument("--nn-compute-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="decoder-body compute dtype: bfloat16 halves the "
                        "dominant HBM streams of memory-bound big-K steps "
                        "(f32 accumulation of every (n,k) reduction)")
    p.add_argument("--remat-decoder", action="store_true",
                   help="recompute the decoder in the backward pass "
                        "instead of storing its activations (wins when "
                        "the S*N*K residual streams outweigh the bf16 "
                        "recompute FLOPs)")
    p.add_argument("--fused-mlp-decoder", action="store_true",
                   help="fully-fused Bernoulli MLP-decoder Pallas "
                        "kernel (TPU, 2 tanh hidden layers)")
    p.add_argument("--fused-combine", action="store_true",
                   help="route the SIN combine + local KL + sampling + "
                        "sufficient statistics through the fused Pallas "
                        "kernel (TPU only; big-K bandwidth win)")
    p.add_argument("--kernel-rng", action="store_true",
                   help="with --fused-combine: generate eps inside the "
                        "kernel via the hardware PRNG (drops the threefry "
                        "op + HBM round-trip; different random stream "
                        "than jax.random)")
    p.add_argument("--encoder-head", choices=["diag", "full"],
                   default="diag",
                   help="recognition-potential family: 'diag' (reference-"
                        "matching) or 'full' — Cholesky-parameterized full "
                        "per-point precision, a strict superset (XLA engine "
                        "only; the megakernels gate it loudly)")
    p.add_argument("--recon-mode", choices=["weighted", "sampled"],
                   default="weighted",
                   help="recon estimator: 'weighted' decodes all K "
                        "components (reference-exact); 'sampled' decodes "
                        "one k~Cat(r) per sample — unbiased (REINFORCE-"
                        "corrected), K x less decoder work at large K")
    p.add_argument("--smm-dof", type=float, default=0.0,
                   help="Student-t mixture latent prior with this many "
                        "degrees of freedom (0 = Gaussian mixture prior)")
    p.add_argument("--smm-iters", type=int, default=2,
                   help="u-z coordinate rounds in the SMM combine")
    p.add_argument("--engine", choices=["xla", "megakernel", "auto"],
                   default="xla",
                   help="hot-loop engine: 'xla' = scan-chunked jitted step "
                        "(default); 'megakernel' = the whole-train-step "
                        "Pallas kernel (headline pinwheel engine, ~19k "
                        "steps/s marginal on v5e; errors with the reason "
                        "when the workload is outside its shape class); "
                        "'auto' = megakernel when supported and on TPU. "
                        "NOTE: the megakernel draws eps from the hardware "
                        "PRNG — same distribution, different stream than "
                        "the XLA path's threefry")
    p.add_argument("--smm-envelope-grads", action="store_true",
                   help="envelope-theorem gradients for the SMM u-rounds: "
                        "stop-gradient the converged q(u) so the backward "
                        "pass skips the coordinate combines (~exact at the "
                        "u fixed point; measured numbers in BASELINE.md)")
    args = p.parse_args()

    from configs import apply_config

    apply_config(args, p)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        from svax.utils.guards import enable_nan_debugging

        enable_nan_debugging()
    import jax.numpy as jnp
    import optax

    from svax.data import load_dataset
    from svax.models.svae import SvaeConfig

    def svae_mod_select(dof: float):
        if dof > 0.0:
            from svax.models import svae_smm

            return svae_smm
        from svax.models import svae

        return svae
    from svax.pgm import gmm
    from svax.train import svae_step
    from svax.train.loop import augment_step

    train, test, meta = load_dataset(args.dataset, seed=args.seed)
    likelihood = meta["likelihood"]
    x_train = jnp.asarray(train, dtype=jnp.float32)
    x_test = jnp.asarray(test, dtype=jnp.float32)
    n, input_dim = x_train.shape
    batch = args.batch_size if args.batch_size > 0 else n

    config = SvaeConfig(
        latent_dim=args.latent_dim,
        num_components=args.num_components,
        num_samples=args.num_samples,
        likelihood=likelihood,
        num_total=n,
        nn_precision={
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
        }[args.nn_precision],
        remat_combine=args.remat,
        dof=args.smm_dof,
        smm_iters=args.smm_iters,
        smm_envelope_grads=args.smm_envelope_grads,
        nn_compute_dtype=args.nn_compute_dtype,
        recon_mode=args.recon_mode,
        fused_combine=args.fused_combine,
        remat_decoder=args.remat_decoder,
        fused_mlp_decoder=args.fused_mlp_decoder,
        kernel_rng=args.kernel_rng,
        encoder_head=args.encoder_head,
    )
    model = svae_mod_select(args.smm_dof)
    prior = gmm.make_prior(
        args.num_components, args.latent_dim, alpha=args.alpha, kappa=args.kappa
    )
    opt = (
        optax.adamw(args.lr, weight_decay=args.weight_decay)
        if args.weight_decay > 0.0
        else optax.adam(args.lr)
    )
    key = jax.random.PRNGKey(args.seed)
    k_init, k_run = jax.random.split(key)
    state = svae_step.init_state(
        k_init,
        input_dim,
        config,
        prior,
        opt,
        encoder_hidden=tuple(args.encoder_hidden),
        decoder_hidden=tuple(args.decoder_hidden),
    )
    start_step = 0
    ckpt = None
    if args.checkpoint_dir:
        from svax.train import checkpoint as ckpt_mod

        ckpt = ckpt_mod.Checkpointer(args.checkpoint_dir)
        if args.resume:
            state, k_run, start_step = ckpt.restore_or(state, k_run)

    if args.warmup_steps > 0 and start_step == 0:
        from svax.train.warmup import vae_warmup_reseed

        k_run, k_warm = jax.random.split(k_run)
        t_warm = time.perf_counter()
        state, winfo = vae_warmup_reseed(
            state, x_train, config, prior, opt, k_warm,
            steps=args.warmup_steps, batch_size=args.batch_size,
            scan_chunk=args.scan_chunk or 100, model=model,
            seed=args.seed,
        )
        print(
            f"warmup {args.warmup_steps} steps + k-means++ reseed "
            f"({time.perf_counter() - t_warm:.1f}s): "
            f"seed occupancy {winfo['seed_occupancy']}, "
            f"cov_scale {winfo['cov_scale']:.4g}"
        )

    rho = (
        args.rho
        if args.rho_decay == 0.0
        else (lambda t: args.rho / (1.0 + args.rho_decay * t))
    )
    engine = args.engine
    if engine != "xla":
        from svax.train.loop import megakernel_unsupported_reason

        reason = megakernel_unsupported_reason(
            config,
            batch_full=batch >= n,
            encoder_hidden=tuple(args.encoder_hidden),
            decoder_hidden=tuple(args.decoder_hidden),
            rho=rho,
            data_parallel=args.dp,
            aug_noise=args.aug_noise,
            weight_decay=args.weight_decay,
            input_dim=input_dim,
            rho_decay=args.rho_decay,
        )
        on_tpu = jax.devices()[0].platform == "tpu"
        if engine == "auto":
            engine = "megakernel" if reason is None and on_tpu else "xla"
        elif reason is not None:
            p.error(f"--engine megakernel: {reason}")

    if args.dp:
        from svax.parallel import mesh as pmesh

        dmesh = pmesh.make_data_mesh()
        ndev = dmesh.devices.size
        if batch % ndev:
            batch = (batch // ndev) * ndev or ndev
            print(f"rounding batch to {batch} for {ndev}-device mesh")
        step = pmesh.data_parallel_step(
            svae_step.make_train_step(
                config, prior, opt, rho, axis_name="data", model=model
            ),
            dmesh,
        )
    else:
        step = jax.jit(augment_step(svae_step.make_train_step(
            config, prior, opt, rho, model=model), args.aug_noise))
    evaluate = jax.jit(svae_step.make_eval_fn(config, prior, model=model))

    logf = open(args.logfile, "a") if args.logfile else None
    print(
        f"devices={jax.devices()} dataset={args.dataset} "
        f"synthetic={meta.get('synthetic', False)} n={n} D={input_dim} "
        f"K={args.num_components} L={args.latent_dim} likelihood={likelihood}"
    )

    if (args.dp or args.scan_chunk <= 0) and engine == "xla":
        # Warm-compile the per-step path so steps/sec excludes the cold
        # compile. The scan runners are separate compilations — warming the
        # per-step jit for them wastes a cold TPU compile (ADVICE r1).
        state_w, _ = step(state, x_train[:batch], k_run)
        jax.block_until_ready(state_w.pgm_nat.dir_nat)

    def emit(t, metrics):
        ev = evaluate(state, x_test, k_run)
        row = {
            "step": t,
            "elbo": float(metrics["elbo"]),
            "recon": float(metrics["recon"]),
            "local_kl": float(metrics["local_kl"]),
            "global_kl": float(metrics["global_kl"]),
            "test_elbo_per_point": float(ev["elbo_per_point"]),
            # Wall clock since the (post-warm-up) timer start — the
            # time-to-target metric reads this directly.
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        print(json.dumps(row))
        if logf:
            logf.write(json.dumps(row) + "\n")
        if ckpt is not None:
            ckpt.save(t, state, k_run)

    t0 = time.perf_counter()
    if engine == "megakernel":
        from svax.train.loop import make_megakernel_runner

        runner = make_megakernel_runner(
            config, prior, lr=args.lr, rho=args.rho,
            rho_decay=args.rho_decay,
            batch_size=0 if batch >= n else batch,
            aug_noise=args.aug_noise,
            encoder_hidden=tuple(args.encoder_hidden),
            decoder_hidden=tuple(args.decoder_hidden),
        )
        chunk = args.scan_chunk if args.scan_chunk > 0 else 1000
        # Warm-compile at the chunk length the loop uses, outside the
        # timed region (the result is discarded; state is unchanged).
        warm, _ = runner(state, x_train, min(chunk, args.steps),
                         seed=args.seed)
        jax.block_until_ready(warm.pgm_nat.dir_nat)
        t0 = time.perf_counter()
        t = start_step
        while t < args.steps:
            todo = min(chunk, args.steps - t)
            state, metrics = runner(state, x_train, todo, seed=args.seed)
            t += todo
            emit(t, {k: v[-1] for k, v in metrics.items()})
    elif args.scan_chunk > 0 and not args.dp:
        from svax.train.loop import make_minibatch_scan_runner, make_scan_runner

        raw_step = augment_step(
            svae_step.make_train_step(config, prior, opt, rho, model=model),
            args.aug_noise,
        )

        def make_runners(length):
            return (
                make_scan_runner(raw_step, length),
                make_minibatch_scan_runner(raw_step, length),
            )

        chunk = args.scan_chunk
        runner_full, runner_mb = make_runners(chunk)
        # AOT-compile the runner the loop will use first, so the cold
        # compile stays outside the timed region (mirrors the per-step
        # warm-up of the non-scan path).
        if batch < n:
            runner_mb.lower(
                state,
                jax.ShapeDtypeStruct((chunk, batch) + x_train.shape[1:], x_train.dtype),
                k_run,
            ).compile()
        else:
            runner_full.lower(state, x_train, k_run).compile()
        t0 = time.perf_counter()
        t = start_step
        while t < args.steps:
            todo = min(chunk, args.steps - t)
            if todo != chunk:
                runner_full, runner_mb = make_runners(todo)
            k_run, k_batch, k_chunk = jax.random.split(k_run, 3)
            if batch < n:
                idx = jax.random.randint(k_batch, (todo, batch), 0, n)
                state, metrics = runner_mb(state, x_train[idx], k_chunk)
            else:
                state, metrics = runner_full(state, x_train, k_chunk)
            t += todo
            last = {k: v[-1] for k, v in metrics.items()}
            emit(t, last)
    else:
        for t in range(start_step, args.steps):
            k_run, k_batch, k_step = jax.random.split(k_run, 3)
            if batch < n:
                idx = jax.random.choice(k_batch, n, (batch,), replace=False)
                xb = x_train[idx]
            else:
                xb = x_train
            state, metrics = step(state, xb, k_step)
            if (t + 1) % args.eval_every == 0 or t == start_step:
                emit(t + 1, metrics)
    jax.block_until_ready(state.pgm_nat.dir_nat)
    dt = time.perf_counter() - t0
    steps_run = args.steps - start_step
    print(f"steps/sec: {steps_run / dt:.1f}")
    if args.iw_samples > 0:
        from svax.models import evaluation

        iw = evaluation.svae_iw_loglik(
            state.nn_params, state.pgm_nat, x_test, k_run, config, args.iw_samples
        )
        print(json.dumps({"final_test_iw_loglik_per_point": float(jnp.mean(iw)),
                          "iw_samples": args.iw_samples}))
    if args.plot:
        import numpy as np

        from svax.models import svae as svae_mod
        from svax.utils import viz

        out = svae_mod.forward(
            state.nn_params, state.pgm_nat, prior, x_train, k_run,
            config._replace(num_samples=1),
        )
        resp = np.exp(np.asarray(out.posterior.log_resp))
        z_mean = np.einsum("nk,nkd->nd", resp, np.asarray(out.posterior.mean))
        viz.plot_latent_space(z_mean, resp, state.pgm_nat, args.plot,
                              title=f"SVAE latent ({args.dataset})")
        print(f"wrote {args.plot}")
    if ckpt is not None:
        ckpt.save(args.steps, state, k_run)
        ckpt.close()
    if args.bundle_dir:
        from svax import serve

        act_name = "tanh" if config.activation is jnp.tanh else "relu"
        serve.save_bundle(
            args.bundle_dir,
            state,
            serve.ModelSpec(
                input_dim=input_dim,
                latent_dim=args.latent_dim,
                num_components=args.num_components,
                likelihood=likelihood,
                encoder_hidden=tuple(args.encoder_hidden),
                decoder_hidden=tuple(args.decoder_hidden),
                num_samples=args.num_samples,
                alpha=args.alpha,
                kappa=args.kappa,
                dof=args.smm_dof,
                smm_iters=args.smm_iters,
                activation=act_name,
                num_total=n,
            ),
        )
        print(f"wrote serving bundle to {args.bundle_dir}")
    if logf:
        logf.close()


if __name__ == "__main__":
    main()
