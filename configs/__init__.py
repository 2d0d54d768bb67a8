"""Named experiment configs — one per BASELINE.json entry (SURVEY.md §6).

Each config is a plain dict of CLI-flag defaults for the experiment
scripts; ``--config <name>`` applies it, explicit flags still override.
Hyperparameter values follow SURVEY.md §4.5 (paper-typical; the reference's
exact values are unrecoverable — empty mount, §0).
"""

CONFIGS: dict[str, dict] = {
    # BASELINE config #1
    "pinwheel-svae": dict(
        dataset="pinwheel",
        num_components=10,
        latent_dim=2,
        num_samples=4,
        encoder_hidden=[50, 50],
        decoder_hidden=[50, 50],
        steps=5000,
        batch_size=0,
        lr=1e-3,
        rho=0.05,
        alpha=1.0,
        kappa=0.05,
    ),
    # BASELINE config #2
    "pinwheel-gmm": dict(
        num_components=10,
        steps=300,
        batch_size=0,
        rho=1.0,
        alpha=1.0,
        kappa=0.05,
    ),
    # BASELINE config #3
    "auto-svae": dict(
        dataset="auto",
        num_components=10,
        latent_dim=4,
        num_samples=4,
        encoder_hidden=[100, 100],
        decoder_hidden=[100, 100],
        steps=10000,
        batch_size=64,
        lr=1e-3,
        rho=0.2,
        rho_decay=0.001,
        alpha=1.0,
        kappa=0.05,
    ),
    # BASELINE config #4
    "mnist-svae": dict(
        dataset="mnist",
        num_components=10,
        latent_dim=8,
        num_samples=1,
        encoder_hidden=[200, 200],
        decoder_hidden=[200, 200],
        steps=20000,
        batch_size=256,
        lr=1e-3,
        rho=0.1,
        rho_decay=0.001,
        alpha=1.0,
        kappa=0.05,
    ),
    # BASELINE config #5 — large-K high-dim latent with DP psum over ICI
    "bigk-dp": dict(
        dataset="mnist",
        num_components=100,
        latent_dim=10,
        num_samples=1,
        encoder_hidden=[200, 200],
        decoder_hidden=[200, 200],
        steps=5000,
        batch_size=1024,
        lr=1e-3,
        rho=0.1,
        rho_decay=0.001,
        alpha=0.5,
        kappa=0.05,
        dp=True,
    ),
}


def apply_config(args, parser) -> None:
    """Overlay a named config onto argparse results, CLI flags win.

    A flag wins over the config only when the user supplied it explicitly
    (detected by comparing against parser defaults).
    """
    if not getattr(args, "config", None):
        return
    cfg = CONFIGS[args.config]
    for key, value in cfg.items():
        dest = key.replace("-", "_")
        if not hasattr(args, dest):
            continue
        if getattr(args, dest) == parser.get_default(dest):
            setattr(args, dest, value)
