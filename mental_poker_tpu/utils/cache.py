"""Persistent XLA compilation cache setup.

The framework's jitted graphs are large (hundreds of field-mul subgraphs per
point op); compiling them is far more expensive than running them. Every entry
point (tests, bench, models) calls `enable_persistent_cache()` so compiled
executables are reused across processes and build rounds.
"""

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def raise_stack_limit(nbytes: int = 1 << 29) -> None:
    """Raise the soft stack rlimit (default 512 MiB).

    XLA's CPU backend JITs some of this framework's stage programs into
    single huge LLVM functions; instruction selection recurses deeply enough
    to blow the default 8 MiB stack (observed: SIGSEGV inside
    backend_compile_and_load at the largest fixed-base-MSM commit programs).
    Must run BEFORE the first backend use: pthread stacks (compile pool) size
    themselves from the soft limit at thread-creation time.
    """
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        if soft != resource.RLIM_INFINITY and soft < nbytes and (
            hard == resource.RLIM_INFINITY or hard >= nbytes
        ):
            resource.setrlimit(resource.RLIMIT_STACK, (nbytes, hard))
    except (ImportError, ValueError, OSError):
        pass  # non-POSIX or locked-down env: leave limits alone


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    raise_stack_limit()

    path = path or os.environ.get("MPTPU_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
