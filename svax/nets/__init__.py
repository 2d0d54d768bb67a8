"""L3 — pure-functional neural nets (SURVEY.md §2 L3).

Small MLP encoder/decoders as plain pytrees + apply functions: everything is
a pure function of (params, inputs), so the whole SVAE step stays one jitted
program with no framework state. Encoder emits a *Gaussian natural
potential* (h, P) per datapoint — diagonal P (reference-matching,
SURVEY.md §9.4) or Cholesky-parameterized full P (``head="full"``, a strict
superset); decoders provide Gaussian and Bernoulli likelihood heads (§3a).
"""

from svax.nets import mlp  # noqa: F401
from svax.nets.mlp import (  # noqa: F401
    bernoulli_loglik,
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
    encoder_out_dim,
    gaussian_loglik,
    mlp_apply,
    mlp_init,
)
