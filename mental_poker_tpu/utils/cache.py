"""Persistent XLA compilation cache setup.

The framework's jitted graphs are large (hundreds of field-mul subgraphs per
point op); compiling them is far more expensive than running them. Every entry
point (tests, bench, models) calls `enable_persistent_cache()` so compiled
executables are reused across processes and build rounds.
"""

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("MPTPU_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
