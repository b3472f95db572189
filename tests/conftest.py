"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is
validated on `--xla_force_host_platform_device_count=8` CPU devices,
exactly like the driver's multichip dry-run. Must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins the TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: XLA CPU compiles dominate suite time.
import jax  # noqa: E402  (env vars above must be set first)

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
