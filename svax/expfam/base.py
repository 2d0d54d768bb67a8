"""The exponential-family module protocol (SURVEY.md §8 layout, L0).

Every family module in ``svax.expfam`` implements the same functional
surface over its own parameter containers; this Protocol documents the
contract the rest of the stack relies on (and the §5 test obligations
attached to each piece). Modules are *modules*, not classes — the protocol
is duck-typed over module attributes, checkable via ``implements()``.

| Function | Contract | Test obligation |
|---|---|---|
| ``standard_to_natural`` / ``natural_to_standard`` | mutually inverse bijection | round-trip to 1e-9 |
| ``log_partition`` (+ ``log_partition_nat``) | cumulant A; ∇_η A = E[T] | grad-identity test |
| expected statistics (``expected_log_pi`` / ``expected_stats`` / …) | closed forms | scipy / Monte-Carlo oracle |
| ``kl`` | Bregman form ⟨λ_q−λ_p, E_q[T]⟩ − A_q + A_p | ≥0, =0 at equality, MC oracle |
| ``sample`` | exact draws (not the training path) | moment checks |
"""

from __future__ import annotations

from types import ModuleType

_REQUIRED = ("standard_to_natural", "natural_to_standard", "log_partition", "kl")


def implements(module: ModuleType) -> bool:
    """True if ``module`` exposes the exponential-family surface."""
    return all(hasattr(module, name) for name in _REQUIRED)
