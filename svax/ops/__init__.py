"""Batched small-dimension linear algebra and Pallas TPU kernels.

The hot loops of this framework (SURVEY.md §4.1/§4.2) are *huge batches of
tiny PSD solves*: N×K posterior combines and K-component NIW expectation maps
with latent dimension d in the 2–20 range. ``lax.linalg`` routines loop over
``d`` with dynamic control flow, which maps poorly onto the TPU VPU. Instead
``batched_linalg`` unrolls Cholesky / triangular solves over the *static*
``d`` so every intermediate is one fused elementwise op over the full N×K
batch — pure VPU work XLA fuses into neighbouring ops. ``estep_pallas``
provides fused Pallas kernels for the GMM E-step with in-kernel reduction of
weighted sufficient statistics, and ``combine_pallas`` fuses the entire SVAE
SIN combine (chol → μ̃ → softmax → Σ̃ → local KL → sampling → statistics)
into one forward kernel plus two recompute-backward kernels — the big-K
hot path (2.3× the full train step, BASELINE.md).
"""

from svax.ops import (  # noqa: F401
    batched_linalg,
    combine_pallas,
    decoder_pallas,
    estep_pallas,
)
from svax.ops.batched_linalg import (  # noqa: F401
    add_jitter,
    cho_solve_mat,
    cho_solve_vec,
    cholesky,
    inv_psd,
    logdet_from_chol,
    solve_tril_vec,
    solve_triu_vec,
)
