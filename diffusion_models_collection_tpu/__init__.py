"""diffusion_models_collection_tpu — a TPU-native diffusion-model framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
sunyzhi55/Diffusion_Models_Collection (pixel-space DDPM/DDIM diffusion with
UNet / DiT / DiM backbones, classifier-free guidance, EMA, data-parallel
training, FID/IS/LPIPS evaluation).

Architecture (one-way deps, bottom → top):

    ops/        Pallas TPU kernels + XLA fallbacks (flash attention,
                fused GroupNorm+SiLU, adaLN modulation, selective scan)
    diffusion/  Noise schedules and DDPM/DDIM samplers as pure functions
                compiled with `lax.scan` (diffusion never imports models)
    models/     UNet, DiT, DiM denoisers (Flax, NHWC) with the uniform
                contract `apply(variables, x, t, y) -> eps`
    datasets/   Native dataset readers (no torchvision), transforms, loader
    parallel/   Device-mesh + sharding utilities (data-parallel via
                jax.sharding; XLA collectives over ICI)
    utils/      Trainer runtime, EMA, checkpointing, LR schedules, config
    metrics/    FID / Inception Score / LPIPS on TPU

Reference parity map: see SURVEY.md at the repo root; each module docstring
cites the reference file:line it mirrors behaviorally.
"""

__version__ = "0.1.0"
