"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding tests run without TPU hardware. Must run before any
`import jax` (pytest imports conftest first).

The ambient environment may set JAX_PLATFORMS=axon (a tunnel to one real
TPU chip); eager per-op dispatch over that tunnel is orders of magnitude
too slow for unit tests, so we override unconditionally. Set
SDK_TPU_TEST_PLATFORM=axon to opt into on-device runs (used by bench.py,
not by CI tests).
"""

import os

platform = os.environ.get("SDK_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
if platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# A pytest plugin may already have imported jax before this conftest ran, in
# which case the env var above came too late — force the config directly
# (safe as long as no backend has been initialized yet).
import jax

jax.config.update("jax_platforms", platform)

# Persistent compilation cache: the jitted pipelines take ~1 min to compile
# on the CPU backend; cache them across test runs.
_cache_dir = os.environ.get("SDK_TPU_JIT_CACHE", "/tmp/sdk_tpu_jit_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
