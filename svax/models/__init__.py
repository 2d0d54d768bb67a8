"""L2 — models: SVAE (SIN + structured ELBO), VAE and pure-GMM baselines."""

from svax.models import (  # noqa: F401
    evaluation,
    gmm_baseline,
    smm_baseline,
    svae,
    svae_smm,
    vae,
)
from svax.models.svae import SvaeConfig, SvaeOutputs  # noqa: F401
