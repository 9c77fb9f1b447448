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

# persistent XLA compile cache for the suite: the oracle-parity / e2e tests
# are dominated by 30-120 s CPU compiles that are identical between runs —
# a warm cache cuts repeat full-suite time drastically.  Only entries whose
# compile took >= 2 s are stored (keeps the dir small); safe under xdist
# (atomic per-entry writes).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# config.update, not env vars: the axon site hook imports jax before this
# file runs, so import-time env defaults are already frozen
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
