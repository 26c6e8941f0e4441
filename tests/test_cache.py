"""Persistent-cache writer behavior (`utils/cache.py`).

The XLA:CPU AOT-serialize bug forces cache writes into forked children
(cache.py `_patch_cache_write_isolated` docstring). VERDICT r4 #9 asked that
dropped entries stop being silent: a child that dies without a clean write
must leave a line in `<cache_dir>/serialize_failures.log` naming the module.
This drives the wrapped writer directly (no real compile needed).
"""


class _FakeBackend:
    # platform "cpu" routes the write through the fork-isolated path
    platform = "cpu"


def test_failed_child_write_is_logged(tmp_path):
    import jax
    from jax._src import compilation_cache as cc

    assert getattr(cc, "_mptpu_fork_patch", False), "fork patch not installed"
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        # A bogus executable makes the ORIGINAL writer raise inside the
        # child, which then _exit(1)s — the same observable as the XLA
        # serialize crash (modulo signal vs exit code; both non-zero).
        cc.put_executable_and_time(
            b"key", "mptpu_test_failing_module", object(), _FakeBackend(), 0.1
        )
        cc._mptpu_reap(block=True)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)

    log = tmp_path / "serialize_failures.log"
    assert log.exists(), "dropped cache entry was not logged"
    assert "mptpu_test_failing_module" in log.read_text()
