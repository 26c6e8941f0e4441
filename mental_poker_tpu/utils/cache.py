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


_CACHE_WRITE_CHILDREN: list = []
_CACHE_WRITE_NAMES: dict = {}


def _patch_cache_write_isolated() -> None:
    """Isolate CPU persistent-cache executable serialization in a fork.

    XLA:CPU's `executable.serialize()` (AOT export) SEGFAULTS on this
    framework's largest stage programs — reproducibly, at
    `compilation_cache.py:265`, on the first big program whose entry gets
    written, regardless of stack size (a 512 MiB dedicated-thread stack still
    crashes, so it is not the recursion-depth issue `raise_stack_limit`
    covers). The compiled executable itself is FINE — only its AOT
    re-serialization dies — so the fix is to fork and let the child do the
    write: entries that serialize cleanly still land in the cache, the
    pathological few die silently with the child, and the proving process
    never crashes. Only applied to CPU-backend writes (TPU serialization has
    no such issue and forking with a live TPU client is unsafe).
    """
    import atexit as _atexit
    import os as _os
    import signal as _signal

    from jax._src import compilation_cache as cc

    if getattr(cc, "_mptpu_fork_patch", False):
        return
    orig = cc.put_executable_and_time

    def _log_failure(pid: int, status: int) -> None:
        """A child died without exit(0): that cache entry was dropped.

        Record WHICH program so dropped entries are diagnosable (VERDICT r4
        #9: the writer previously dropped them silently) — the log lives next
        to the cache so a warm run that recompiles can be correlated.
        """
        name = _CACHE_WRITE_NAMES.pop(pid, "?")
        try:
            import jax as _jax

            d = _jax.config.jax_compilation_cache_dir or "."
            with open(_os.path.join(d, "serialize_failures.log"), "a") as f:
                sig, code = status & 0x7F, status >> 8
                f.write(f"pid={pid} signal={sig} exit={code} module={name}\n")
        except OSError:
            pass

    def _reap(block: bool = False):
        alive = []
        for pid in _CACHE_WRITE_CHILDREN:
            try:
                done, status = _os.waitpid(pid, 0 if block else _os.WNOHANG)
                if done == 0:
                    alive.append(pid)
                elif status != 0:
                    _log_failure(pid, status)
                else:
                    _CACHE_WRITE_NAMES.pop(pid, None)
            except ChildProcessError:
                _CACHE_WRITE_NAMES.pop(pid, None)
        _CACHE_WRITE_CHILDREN[:] = alive

    # ensure in-flight writes finish (and failures get logged) at exit —
    # otherwise the largest programs, whose writes take longest, lose their
    # entries whenever the process ends right after compiling them.
    _atexit.register(lambda: _reap(block=True))
    cc._mptpu_reap = _reap

    def wrapped(cache_key, module_name, executable, backend, compile_time):
        platform = getattr(backend, "platform", "")
        if platform != "cpu":
            return orig(cache_key, module_name, executable, backend, compile_time)
        _reap()
        import warnings as _warnings

        with _warnings.catch_warnings():
            # the fork is deliberate: the child only serializes+writes and
            # _exit(0)s; it never touches JAX thread state (see docstring).
            # JAX warns RuntimeWarning; CPython 3.12 adds DeprecationWarning.
            _warnings.simplefilter("ignore", RuntimeWarning)
            _warnings.simplefilter("ignore", DeprecationWarning)
            pid = _os.fork()
        if pid == 0:
            # child: bounded lifetime; exit(0) only on a CLEAN write so the
            # parent can log dropped entries (crashes exit via the signal)
            try:
                _signal.alarm(600)
                orig(cache_key, module_name, executable, backend, compile_time)
                _os._exit(0)
            except BaseException:
                _os._exit(1)
        _CACHE_WRITE_CHILDREN.append(pid)
        _CACHE_WRITE_NAMES[pid] = str(module_name)

    cc.put_executable_and_time = wrapped
    cc._mptpu_fork_patch = True


def raise_map_count(target: int = 1 << 20) -> None:
    """Best-effort bump of vm.max_map_count (root-only; no-op otherwise).

    Long proving sessions accumulate mmaps — LLVM JIT code sections, huge
    pthread stacks (see `raise_stack_limit`), zstd-mapped cache entries — and
    the Linux default of 65530 maps is reachable within one full-suite run.
    Past it, mmap returns ENOMEM, LLVM logs "compilation error: Cannot
    allocate memory", and XLA follows with a SIGSEGV (observed; the last of
    the three distinct segfault mechanisms diagnosed in round 3).
    """
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            cur = int(f.read().strip())
        if cur < target:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write(str(target))
    except (OSError, ValueError, PermissionError):
        pass


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    raise_stack_limit()
    raise_map_count()
    _patch_cache_write_isolated()

    from ..config import get_config

    path = path or get_config().cache_dir or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
