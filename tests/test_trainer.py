"""High-level SvaeTrainer: full-batch scan path and minibatch path train."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svax.data import make_pinwheel_data
from svax.models.svae import SvaeConfig
from svax.train.trainer import SvaeTrainer, TrainerConfig


def _data():
    x = make_pinwheel_data(num_classes=3, num_per_class=30, seed=0)
    return jnp.asarray(x[:72], dtype=jnp.float64), jnp.asarray(x[72:], dtype=jnp.float64)


def test_fullbatch_scan_fit(tmp_path):
    x_train, x_test = _data()
    mc = SvaeConfig(latent_dim=2, num_components=4, num_samples=1, num_total=x_train.shape[0])
    tc = TrainerConfig(
        steps=40, eval_every=20, lr=3e-3, rho=0.2,
        encoder_hidden=(16,), decoder_hidden=(16,),
        logfile=str(tmp_path / "log.jsonl"),
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    state = trainer.fit(x_train, x_test)
    assert int(state.step) == 40
    from svax.train.metrics import read_jsonl

    rows = read_jsonl(tmp_path / "log.jsonl")
    assert rows[-1]["step"] == 40
    assert np.isfinite(rows[-1]["elbo"])
    assert rows[-1]["elbo"] > rows[0]["elbo"]


def test_minibatch_scan_fit():
    x_train, x_test = _data()
    mc = SvaeConfig(latent_dim=2, num_components=4, num_samples=1, num_total=x_train.shape[0])
    tc = TrainerConfig(
        steps=30, batch_size=24, eval_every=15, rho=0.3,
        encoder_hidden=(16,), decoder_hidden=(16,),
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    state = trainer.fit(x_train, x_test)
    assert int(state.step) == 30


def test_data_parallel_scan_fit():
    """DP fit: lax.scan composed OVER the shard_map'd step on 8 devices."""
    x_train, x_test = _data()
    mc = SvaeConfig(latent_dim=2, num_components=4, num_samples=1, num_total=x_train.shape[0])
    tc = TrainerConfig(
        steps=20, eval_every=10, rho=0.3, encoder_hidden=(8,), decoder_hidden=(8,),
        data_parallel=True,
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    state = trainer.fit(x_train, x_test)
    assert int(state.step) == 20
    assert np.isfinite(float(state.pgm_nat.dir_nat.sum()))


def test_checkpoint_resume_roundtrip(tmp_path):
    x_train, x_test = _data()
    mc = SvaeConfig(latent_dim=2, num_components=3, num_samples=1, num_total=x_train.shape[0])
    tc = TrainerConfig(
        steps=20, eval_every=10, rho=0.2, encoder_hidden=(8,), decoder_hidden=(8,),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    trainer.fit(x_train)

    # Extending steps resumes from the saved step-20 state.
    tc2 = TrainerConfig(
        steps=30, eval_every=10, rho=0.2, encoder_hidden=(8,), decoder_hidden=(8,),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    trainer2 = SvaeTrainer(mc, tc2, input_dim=2)
    state = trainer2.fit(x_train)
    assert int(state.step) == 30


def test_best_tracking_and_time_to_target(tmp_path):
    """Time-to-target is a first-class artifact: best-held-out tracking,
    best-state snapshot + best checkpoint, target crossing, JSON emission
    (BASELINE metric #2; round-2 VERDICT item 4)."""
    import json

    x_train, x_test = _data()
    mc = SvaeConfig(latent_dim=2, num_components=4, num_samples=1,
                    num_total=x_train.shape[0])
    art = tmp_path / "tt.json"
    tc = TrainerConfig(
        steps=60, eval_every=10, scan_chunk=10, lr=3e-3, rho=0.2,
        encoder_hidden=(16,), decoder_hidden=(16,),
        checkpoint_dir=str(tmp_path / "ck"),
        target_value=-1e6,  # trivially reached at the first eval
        best_artifact=str(art),
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    trainer.fit(x_train, x_test)

    best = trainer.best
    assert best is not None
    assert best["metric"] == "test_elbo_per_point"
    assert np.isfinite(best["best_value"])
    assert 0 < best["best_step"] <= 60
    assert best["target_step"] == 10  # first eval boundary
    assert best["target_wall_s"] is not None
    assert best["stopped_early"] is False
    # Artifact on disk matches the in-memory summary.
    assert json.loads(art.read_text()) == best
    # Best-state snapshot exists and is a real state pytree.
    assert trainer.best_state is not None
    assert int(trainer.best_state.step) == best["best_step"]
    # The best checkpoint directory holds the best step.
    from svax.train.checkpoint import Checkpointer

    best_ckpt = Checkpointer(str(tmp_path / "ck" / "best"))
    assert best_ckpt.latest_step() == best["best_step"]
    best_ckpt.close()


def test_early_stop_at_patience():
    """With patience=1 and an unreachable improvement bar the run stops at
    the second eval instead of running all steps."""
    x_train, x_test = _data()
    mc = SvaeConfig(latent_dim=2, num_components=4, num_samples=1,
                    num_total=x_train.shape[0])
    tc = TrainerConfig(
        steps=500, eval_every=10, scan_chunk=10, rho=0.2,
        encoder_hidden=(16,), decoder_hidden=(16,),
        patience=1, min_delta=1e9,  # nothing can improve by this much
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    state = trainer.fit(x_train, x_test)
    assert trainer.best["stopped_early"] is True
    assert trainer.best["steps_run"] == 20  # eval 1 sets best, eval 2 stops
    assert int(state.step) == 20


def test_megakernel_engine_fit(tmp_path):
    """engine="megakernel" trains through the whole-train-step Pallas
    kernel (interpret mode off-TPU) with the same logging/eval surfaces
    as the xla path."""
    x_train, x_test = _data()
    x_train = x_train.astype(jnp.float32)
    x_test = x_test.astype(jnp.float32)
    mc = SvaeConfig(latent_dim=2, num_components=4, num_samples=2,
                    num_total=x_train.shape[0])
    tc = TrainerConfig(
        steps=6, eval_every=3, scan_chunk=3, lr=3e-3, rho=0.2,
        encoder_hidden=(16, 16), decoder_hidden=(16, 16),
        engine="megakernel",
        logfile=str(tmp_path / "log.jsonl"),
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    state = trainer.fit(x_train, x_test)
    assert int(state.step) == 6
    from svax.train.metrics import read_jsonl

    rows = read_jsonl(tmp_path / "log.jsonl")
    assert rows[-1]["step"] == 6
    for key in ("elbo", "recon", "local_kl", "global_kl",
                "test_elbo_per_point"):
        assert np.isfinite(rows[-1][key]), key
    assert rows[-1]["elbo"] > rows[0]["elbo"]


def test_megakernel_engine_rejects_unsupported():
    """An explicit megakernel request outside BOTH kernel shape classes
    (latent d=7 exceeds tinystep's d=2 and flexstep's d<=6) raises with
    the reason instead of silently falling back."""
    import pytest

    x_train, x_test = _data()
    mc = SvaeConfig(latent_dim=7, num_components=4, num_samples=1,
                    num_total=x_train.shape[0])
    tc = TrainerConfig(steps=2, engine="megakernel",
                       encoder_hidden=(16, 16), decoder_hidden=(16, 16))
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    with pytest.raises(ValueError, match="shape class"):
        trainer.fit(x_train.astype(jnp.float32), None)


def test_flexstep_engine_minibatch_fit(tmp_path):
    """engine="megakernel" with minibatching + latent d=3 routes through
    the flexstep kernel (interpret mode off-TPU) with the same logging
    and eval surfaces as the xla path."""
    x_train, x_test = _data()
    x_train = x_train.astype(jnp.float32)
    x_test = x_test.astype(jnp.float32)
    mc = SvaeConfig(latent_dim=3, num_components=4, num_samples=2,
                    num_total=x_train.shape[0])
    tc = TrainerConfig(
        steps=6, eval_every=3, scan_chunk=3, lr=3e-3, rho=0.2,
        rho_decay=0.01, batch_size=24,
        encoder_hidden=(16, 16), decoder_hidden=(16, 16),
        engine="megakernel",
        logfile=str(tmp_path / "log.jsonl"),
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    state = trainer.fit(x_train, x_test)
    assert int(state.step) == 6
    from svax.train.metrics import read_jsonl

    rows = read_jsonl(tmp_path / "log.jsonl")
    assert rows[-1]["step"] == 6
    for key in ("elbo", "recon", "local_kl", "global_kl", "rho",
                "test_elbo_per_point"):
        assert np.isfinite(rows[-1][key]), key
    # The in-kernel rho schedule decayed from rho0.
    assert rows[-1]["rho"] < 0.2


def test_auto_engine_falls_back_off_tpu():
    """engine="auto" off-TPU silently uses the xla path (megakernel auto
    only engages on real hardware) — the fit still runs to completion."""
    x_train, x_test = _data()
    mc = SvaeConfig(latent_dim=2, num_components=4, num_samples=1,
                    num_total=x_train.shape[0])
    tc = TrainerConfig(steps=4, eval_every=2, scan_chunk=2, rho=0.2,
                       encoder_hidden=(16, 16), decoder_hidden=(16, 16),
                       engine="auto")
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    assert trainer.make_megakernel_runner() is None  # CPU → no kernel
    state = trainer.fit(x_train, x_test)
    assert int(state.step) == 4


def test_gmm_trainer_through_engine(tmp_path):
    """Pure-GMM baseline rides the same engine: scan chunks, eval, logging."""
    from svax.train.trainer import GmmTrainer

    x_train, x_test = _data()
    tc = TrainerConfig(steps=30, eval_every=10, rho=0.8,
                       logfile=str(tmp_path / "g.jsonl"))
    trainer = GmmTrainer(tc, num_components=5, data_dim=2)
    state = trainer.fit(x_train, x_test)
    assert int(state.step) == 30
    from svax.train.metrics import read_jsonl

    rows = read_jsonl(tmp_path / "g.jsonl")
    assert rows[-1]["elbo"] > rows[0]["elbo"]
    assert np.isfinite(rows[-1]["test_evidence_per_point"])


def test_gmm_trainer_data_parallel_matches_single():
    """DP GMM fit through the engine equals the single-device fit exactly
    (full-batch psum'd stats are order-identical; CVI is deterministic)."""
    from svax.train.trainer import GmmTrainer

    x_train, _ = _data()
    tc = TrainerConfig(steps=15, eval_every=5, rho=0.7)
    s1 = GmmTrainer(tc, num_components=4, data_dim=2).fit(x_train)
    tc_dp = TrainerConfig(steps=15, eval_every=5, rho=0.7, data_parallel=True)
    s2 = GmmTrainer(tc_dp, num_components=4, data_dim=2).fit(x_train)
    np.testing.assert_allclose(
        np.asarray(s1.nat.dir_nat), np.asarray(s2.nat.dir_nat), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s1.nat.niw_nat.eta1), np.asarray(s2.nat.niw_nat.eta1), rtol=1e-10
    )


def test_smm_trainer_through_engine():
    from svax.train.trainer import SmmTrainer

    x_train, x_test = _data()
    tc = TrainerConfig(steps=20, eval_every=10, rho=0.8)
    state = SmmTrainer(tc, num_components=4, data_dim=2, dof=4.0).fit(x_train)
    assert int(state.step) == 20
    assert np.isfinite(float(state.nat.dir_nat.sum()))


def test_vae_trainer_through_engine(tmp_path):
    from svax.models import vae
    from svax.train.trainer import VaeTrainer

    x_train, x_test = _data()
    mc = vae.VaeConfig(latent_dim=2, num_samples=1)
    tc = TrainerConfig(steps=40, eval_every=20, lr=3e-3,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       logfile=str(tmp_path / "v.jsonl"))
    state = VaeTrainer(mc, tc, input_dim=2).fit(x_train, x_test)
    assert int(state.step) == 40
    from svax.train.metrics import read_jsonl

    rows = read_jsonl(tmp_path / "v.jsonl")
    assert rows[-1]["elbo_per_point"] > rows[0]["elbo_per_point"]
    assert np.isfinite(rows[-1]["test_elbo_per_point"])


def test_vae_trainer_data_parallel():
    from svax.models import vae
    from svax.train.trainer import VaeTrainer

    x_train, _ = _data()
    mc = vae.VaeConfig(latent_dim=2, num_samples=1)
    tc = TrainerConfig(steps=10, eval_every=5, encoder_hidden=(8,),
                       decoder_hidden=(8,), data_parallel=True)
    state = VaeTrainer(mc, tc, input_dim=2).fit(x_train)
    assert int(state.step) == 10
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))


def test_gmm_trainer_megakernel_engine(tmp_path):
    """engine="megakernel" drives the GMM baseline through the mixture
    whole-train-step kernel (interpret mode off-TPU) and matches the xla
    engine's naturals trajectory."""
    from svax.train.trainer import GmmTrainer

    x_train, x_test = _data()
    x_train = x_train.astype(jnp.float32)
    x_test = x_test.astype(jnp.float32)
    kw = dict(steps=12, eval_every=4, scan_chunk=4, rho=0.5)
    tc = TrainerConfig(engine="megakernel",
                       logfile=str(tmp_path / "gm.jsonl"), **kw)
    state = GmmTrainer(tc, num_components=5, data_dim=2).fit(x_train, x_test)
    assert int(state.step) == 12
    ref = GmmTrainer(TrainerConfig(**kw), num_components=5,
                     data_dim=2).fit(x_train, x_test)
    np.testing.assert_allclose(
        np.asarray(state.nat.dir_nat), np.asarray(ref.nat.dir_nat),
        rtol=3e-4, atol=3e-4,
    )
    from svax.train.metrics import read_jsonl

    rows = read_jsonl(tmp_path / "gm.jsonl")
    assert rows[-1]["step"] == 12
    for key in ("elbo", "local_evidence", "test_evidence_per_point"):
        assert np.isfinite(rows[-1][key]), key
    assert rows[-1]["elbo"] > rows[0]["elbo"]

    # The opt-in in-kernel unroll (TrainerConfig.megakernel_unroll) must
    # leave the trajectory unchanged up to float-scheduling noise (the
    # chunk is 4 steps, so unroll=4 runs each chunk as one grid
    # iteration of 4 in-register steps).
    tcu = TrainerConfig(engine="megakernel", megakernel_unroll=4, **kw)
    stu = GmmTrainer(tcu, num_components=5, data_dim=2).fit(x_train, x_test)
    np.testing.assert_allclose(
        np.asarray(stu.nat.dir_nat), np.asarray(state.nat.dir_nat),
        rtol=3e-4, atol=3e-4,
    )


def test_smm_trainer_megakernel_engine():
    """The SMM baseline rides the same kernel with u-weighted stats."""
    from svax.train.trainer import SmmTrainer

    x_train, _ = _data()
    x_train = x_train.astype(jnp.float32)
    kw = dict(steps=8, eval_every=4, scan_chunk=4, rho=0.5)
    state = SmmTrainer(TrainerConfig(engine="megakernel", **kw),
                       num_components=4, data_dim=2, dof=4.0).fit(x_train)
    ref = SmmTrainer(TrainerConfig(**kw), num_components=4, data_dim=2,
                     dof=4.0).fit(x_train)
    assert int(state.step) == 8
    np.testing.assert_allclose(
        np.asarray(state.nat.niw_nat.eta1),
        np.asarray(ref.nat.niw_nat.eta1), rtol=3e-4, atol=3e-4,
    )


def test_gmm_trainer_megakernel_rejects_unsupported():
    """Explicit megakernel request with minibatching raises the reason."""
    import pytest

    from svax.train.trainer import GmmTrainer

    x_train, _ = _data()
    tc = TrainerConfig(steps=2, batch_size=16, engine="megakernel")
    with pytest.raises(ValueError, match="full batch"):
        GmmTrainer(tc, num_components=4, data_dim=2).fit(
            x_train.astype(jnp.float32)
        )


def test_warmup_reseed_through_trainer():
    """warmup_steps > 0 runs the anti-collapse recipe (rho=0 warmup +
    k-means++ reseed of the encoded latent means, svax/train/warmup.py)
    before the main loop; the fit completes with its diagnostics attached
    and all reseeded naturals valid."""
    x_train, x_test = _data()
    x_train = x_train.astype(jnp.float32)
    x_test = x_test.astype(jnp.float32)
    # latent 3 != input 2: the collapse-prone regime warmup exists for.
    mc = SvaeConfig(latent_dim=3, num_components=4, num_samples=1,
                    num_total=x_train.shape[0])
    tc = TrainerConfig(
        steps=20, eval_every=10, scan_chunk=10, rho=0.2,
        encoder_hidden=(16,), decoder_hidden=(16,),
        warmup_steps=20,
    )
    trainer = SvaeTrainer(mc, tc, input_dim=2)
    state = trainer.fit(x_train, x_test)
    assert int(state.step) == 20  # reseed resets the step counter
    info = trainer.warmup_info
    assert info["seed_occupancy"] >= 2
    assert info["cov_scale"] > 0
    # Reseeded naturals are valid NIW params: counts grew by pseudo_counts.
    assert np.all(np.asarray(state.pgm_nat.niw_nat.eta2) > 0)
    assert np.isfinite(float(state.pgm_nat.dir_nat.sum()))


def test_warmup_on_mixture_trainer_raises():
    """Encoder-less trainers reject warmup_steps with a clear error."""
    import pytest

    from svax.train.trainer import GmmTrainer

    x_train, _ = _data()
    tc = TrainerConfig(steps=4, rho=0.5, warmup_steps=5)
    with pytest.raises(NotImplementedError, match="warmup"):
        GmmTrainer(tc, num_components=4, data_dim=2).fit(x_train)


def test_gmm_trainer_auto_engine_falls_back_off_tpu():
    from svax.train.trainer import GmmTrainer

    x_train, _ = _data()
    tc = TrainerConfig(steps=4, eval_every=2, rho=0.5, engine="auto")
    trainer = GmmTrainer(tc, num_components=4, data_dim=2)
    state = trainer.fit(x_train)
    assert trainer.make_megakernel_runner() is None  # CPU → no kernel
    assert int(state.step) == 4


@pytest.mark.slow  # ~16s warm; the fast tier covers runner-level resume
def test_megakernel_trainer_resume_bitexact_and_skips_warmup(tmp_path):
    """Trainer-level checkpoint/resume through the megakernel engine
    (VERDICT r4 #1): interrupt at the chunk boundary, restore from orbax,
    finish — final state is bit-identical to the uninterrupted run, and
    the warmup phase is NOT re-run on resume (the TrainerConfig promise:
    "skipped automatically when resuming from a checkpoint past step 0")."""
    x_train, _ = _data()
    x_train = x_train.astype(jnp.float32)
    mc = SvaeConfig(latent_dim=2, num_components=4, num_samples=2,
                    num_total=x_train.shape[0])

    warmup_calls = []

    class SpyTrainer(SvaeTrainer):
        def warmup(self, state, x, key):
            warmup_calls.append(int(self.tc.steps))
            return super().warmup(state, x, key)

    def tc(steps, ckpt):
        return TrainerConfig(
            steps=steps, eval_every=4, scan_chunk=4, lr=3e-3, rho=0.2,
            encoder_hidden=(16, 16), decoder_hidden=(16, 16),
            engine="megakernel", warmup_steps=4,
            checkpoint_dir=str(ckpt),
        )

    # Uninterrupted: warmup(4) + 8 megakernel steps in two chunks.
    ref = SpyTrainer(mc, tc(8, tmp_path / "ref"), input_dim=2).fit(x_train)
    assert warmup_calls == [8]

    # Interrupted at step 4, then resumed to 8 with a FRESH trainer.
    SpyTrainer(mc, tc(4, tmp_path / "cut"), input_dim=2).fit(x_train)
    assert warmup_calls == [8, 4]
    resumed = SpyTrainer(mc, tc(8, tmp_path / "cut"), input_dim=2).fit(x_train)
    # The resumed fit restored step 4 > 0 → warmup must NOT run again.
    assert warmup_calls == [8, 4]

    assert int(resumed.step) == 8
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
