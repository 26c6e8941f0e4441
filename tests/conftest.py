"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's CI role (`cargo test`, test.yml:39-60) while adding the
multi-device coverage the reference lacks (SURVEY §4): the CPU backend with
--xla_force_host_platform_device_count=8 exercises every pjit/shard_map path
without TPU hardware.
"""

import os
import sys

# Force the CPU backend for tests (the ambient environment pins an
# experimental TPU relay backend which must only be used by bench.py).
if os.environ.get("MPTPU_TEST_PLATFORM") != "keep":
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mental_poker_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
