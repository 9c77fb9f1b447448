from ssl_tpu.diffusion.color_fix import adain_color_fix, wavelet_color_fix  # noqa: F401
from ssl_tpu.diffusion.ddpm_ssl import DiffusionSSLConfig, DiffusionTrainState, StableSRSSL  # noqa: F401
from ssl_tpu.diffusion.sampler import ddim_sample, spaced_ddpm_sample, tiled_sample  # noqa: F401
from ssl_tpu.diffusion.schedules import (  # noqa: F401
    build_schedule_arrays, make_beta_schedule, q_sample, space_timesteps,
)
from ssl_tpu.diffusion.unet import EncoderUNetModelWT, UNetModelDualcondV2  # noqa: F401
from ssl_tpu.diffusion.vae import AutoencoderKL  # noqa: F401
