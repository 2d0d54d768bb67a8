"""L4 — training harness: jitted steps, checkpointing, metrics."""

from svax.train import svae_step  # noqa: F401
from svax.train.svae_step import SvaeTrainState, init_state, make_eval_fn, make_train_step  # noqa: F401
