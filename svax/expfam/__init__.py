"""L0 — exponential-family distribution cores (SURVEY.md §2 L0, §9).

Each module carries *natural parameters* end-to-end and exposes the same
public surface the reference's ``distributions/`` package is recalled to have
(SURVEY.md §3a; unverified — empty mount, §0):

* ``standard_to_natural`` / ``natural_to_standard`` — bijective param maps
* expected sufficient statistics under the distribution
* ``log_partition`` — the cumulant function A(η); its natural-parameter
  gradient equals the expected sufficient statistics (the exp-family
  identity, used as a correctness test per SURVEY.md §5)
* ``kl`` — closed-form KL divergences via the exp-family Bregman form
  ``KL(q‖p) = ⟨λ_q − λ_p, E_q[T]⟩ − A(λ_q) + A(λ_p)``
"""

from svax.expfam import base, dirichlet, mvn, niw  # noqa: F401
from svax.expfam.niw import NiwNat, NiwStandard  # noqa: F401
