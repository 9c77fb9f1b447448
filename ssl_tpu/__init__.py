"""ssl_tpu — TPU-native framework for Self-similarity-Loss generative image SR.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ChrisDud0257/SSL
(ACM MM 2024): plug-and-play self-similarity training penalty for Real-ISR,
plus the surrounding SR training/eval machinery (archs, losses, degradations,
datasets, metrics, distributed training, checkpointing).

Layout
------
- ``ssl_tpu.ops``       compute kernels (SSG similarity, resize, edge masks, DiffJPEG)
- ``ssl_tpu.losses``    loss zoo (pixel / perceptual / GAN / SSL)
- ``ssl_tpu.archs``     flax generator & discriminator architectures
- ``ssl_tpu.data``      datasets, degradation pipelines, loaders
- ``ssl_tpu.models``    training recipes (functional TrainState + jitted steps)
- ``ssl_tpu.metrics``   IQA metric suite (PSNR/SSIM/NIQE/LPIPS/DISTS/FID/...)
- ``ssl_tpu.parallel``  mesh / sharding / multi-host utilities
- ``ssl_tpu.diffusion`` latent-diffusion SR tree (StableSR-SSL equivalent)
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS env var at import time.  Site hooks (e.g.
# a TPU image's) may import jax and pin jax_platforms BEFORE any CLI runs,
# after which the env var alone is silently ignored — a user running
# `JAX_PLATFORMS=cpu python -m ssl_tpu...` would instead hang on an
# unreachable accelerator.  Updating the config here (before any backend
# initializes) restores env-var semantics for every CLI in the package.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    if str(_jax.config.jax_platforms or "") != _os.environ["JAX_PLATFORMS"]:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
