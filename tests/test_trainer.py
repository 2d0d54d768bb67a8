"""High-level SvaeTrainer: full-batch scan path and minibatch path train."""

import jax.numpy as jnp
import numpy as np

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
