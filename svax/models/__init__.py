"""L2 — models: SVAE (SIN + structured ELBO), VAE and pure-GMM baselines."""

from svax.models import evaluation, gmm_baseline, smm_baseline, svae, vae  # noqa: F401
from svax.models.svae import SvaeConfig, SvaeOutputs  # noqa: F401
