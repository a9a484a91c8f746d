"""Test config: force an 8-device virtual CPU mesh.

All tests run on CPU (fast, deterministic); multi-chip sharding tests use
the 8 virtual devices.  TPU benchmarking happens via bench.py, not tests.
"""

import os

import jax

# Force the 8-device virtual CPU mesh.  The environment exports
# JAX_PLATFORMS=axon and its sitecustomize hooks override env-var
# platform selection, so this must go through the config API.
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: XLA-CPU compiles of large scatters take
# minutes on this 1-core box; cache makes reruns instant
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
