"""Test config: force an 8-device CPU mesh so sharding tests run anywhere.

The image's axon site hook pins JAX_PLATFORMS=axon (the tunneled TPU); tests
must run on CPU, so we both set the env var and override the config after
import (the latter is what actually wins against the hook)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
