"""svax — TPU-native structured VAEs with natural-gradient message passing.

A ground-up JAX/Pallas rebuild of the capabilities of ``emtiyaz/vmp-for-svae``
(Lin, Hubacher, Khan — "Variational Message Passing with Structured Inference
Networks", ICLR 2018, arXiv:1803.05589). See ``SURVEY.md`` for the layer map
this package implements and the math contract (§9) every module satisfies.

Layer map (SURVEY.md §2):

* L0  ``svax.expfam``   — exponential-family cores (Dirichlet, MVN, NIW)
* L0' ``svax.ops``      — batched small-d linalg + Pallas kernels
* L1  ``svax.pgm``      — GMM inference engine + CVI natural-gradient updates
* L2  ``svax.models``   — SVAE (SIN combine + structured ELBO), VAE baseline
* L3  ``svax.nets``     — pure-functional MLP encoder/decoder heads
* L4  ``svax.train``    — jitted train steps, checkpointing, metrics
* L4' ``svax.parallel`` — device mesh / shard_map data parallelism (psum of
        sufficient statistics over ICI)
* L5  ``svax.data``     — pinwheel / UCI-Auto / MNIST loaders
* L6  ``svax.serve``    — self-describing model bundles + bucketed,
        recompile-free batch inference (encode / score / reconstruct /
        generate); rebuild-first, no reference counterpart

Note: the reference mount was empty during the survey (SURVEY.md §0), so
docstrings cite SURVEY.md sections and paper equations rather than
``file:line`` locations in the reference.
"""

__version__ = "0.1.0"

from svax import data, expfam, models, nets, ops, parallel, pgm, serve, train  # noqa: F401
