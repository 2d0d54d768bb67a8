"""L1 — GMM/PGM inference engine and CVI natural-gradient updates.

SURVEY.md §2 L1: E-step responsibilities from expected natural parameters,
weighted sufficient statistics with minibatch scaling, and the
natural-gradient (SVI/CVI) update  η ← (1−ρ)η + ρ(η₀ + s̄)  of the
Dirichlet+NIW global parameters (§9.5). The psum of sufficient statistics
for data parallelism (SURVEY.md §3b) hooks in between ``suff_stats*`` and
``cvi_update``.
"""

from svax.pgm import gmm, natgrad, smm  # noqa: F401
from svax.pgm.gmm import GmmExpected, GmmNat  # noqa: F401
from svax.pgm.natgrad import cvi_update  # noqa: F401
