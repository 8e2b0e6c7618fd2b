"""Test configuration: run on CPU with 8 virtual devices and float64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count=8); numerical parity tests use f64.

Note: the session's sitecustomize imports jax and registers a TPU plugin
before pytest starts, so env vars alone are too late — we must update the
jax config objects directly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles dominate the suite's wall time
# on the 1-core host (~25 of ~28 minutes cold); with the cache warm the same
# suite reruns in a fraction of that.  Safe across code changes — the cache
# key hashes the jaxpr/HLO, so edited computations recompile automatically.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
