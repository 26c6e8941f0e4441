"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's CI role (`cargo test`, test.yml:39-60) while adding the
multi-device coverage the reference lacks (SURVEY §4): the CPU backend with
--xla_force_host_platform_device_count=8 exercises every pjit/shard_map path
without TPU hardware.

NOTE: this environment force-registers an experimental remote-TPU ("axon")
PJRT backend at interpreter startup and overrides the JAX_PLATFORMS env var,
so the env var alone does NOT select CPU — `jax.config.update` after import is
the only working override. Tests must never run over the TPU tunnel (per-op
dispatch latency is ~ms; the suite would take hours).
"""

import os
import resource
import sys

# XLA's CPU backend JITs some of this framework's stage programs into single
# huge LLVM functions; instruction selection recurses deeply enough to blow
# the default 8 MiB stack (observed: SIGSEGV inside backend_compile_and_load,
# reproducibly, at the largest fixed-base-MSM commit programs). Raise the soft
# limit BEFORE the backend spawns any compile threads — pthread stacks size
# themselves from the soft limit at thread-creation time.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _hard == resource.RLIM_INFINITY or _hard >= 1 << 29:
    resource.setrlimit(resource.RLIMIT_STACK, (1 << 29, _hard))  # 512 MiB

# XLA_FLAGS is read lazily at first backend initialization, which happens
# after this module runs — so setting it here still works.
# --xla_cpu_max_isa=AVX2 is REQUIRED for the persistent compilation cache to
# actually load on CPU: without it XLA records pseudo-features
# (+prefer-no-scatter/+prefer-no-gather) in the AOT result that the host
# feature check rejects, silently recompiling every program every process.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in _flags:
    _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

if os.environ.get("MPTPU_TEST_PLATFORM") != "keep":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mental_poker_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests (canonical shapes, multi-process)"
    )
