"""L5 — datasets: pinwheel synthetic, UCI Auto, MNIST (SURVEY.md §2 L5)."""

from svax.data.pinwheel import load_pinwheel, make_pinwheel_data  # noqa: F401
