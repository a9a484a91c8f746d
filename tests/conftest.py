"""Test config: force an 8-device virtual CPU mesh.

All tests run on CPU (fast, deterministic); multi-chip sharding tests use
the 8 virtual devices.  TPU benchmarking happens via bench.py, not tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compile cache: XLA-CPU compiles of large scatters take
# minutes on this 1-core box; cache makes reruns instant
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
