"""Enable the persistent XLA compilation cache (compiles through the
axon tunnel take minutes; the cache makes reruns instant)."""
import os
import jax


def enable_compile_cache(path: str | None = None) -> None:
    path = path or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
