"""Multi-host distribution (SURVEY §2.3, communication-backend row).

The reference is a single-process library with no communication backend; the
TPU-native equivalent is XLA collectives over ICI within a slice and DCN
across hosts, reached through `jax.distributed.initialize` + a global mesh.

This module is the single entry point a multi-host launcher calls before any
backend use. On a single host (or when the env provides no coordinator) it is
a no-op, so every code path in this repo runs unchanged from 1 chip to a pod:
the (dp, sp) meshes built by `parallel.sharding.make_mesh` use
`jax.devices()`, which after `initialize()` spans every host's chips, and the
`shard_map` collectives (`all_gather` combines, TP window partitioning) ride
ICI within a slice and DCN across slices with no code changes.

Launcher contract (standard JAX multi-host):
  JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i \
      python your_driver.py
or pass the same values explicitly to `init_distributed`.
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize JAX multi-host distribution if configured; else no-op.

    Returns True when running distributed (more than one process). Must be
    called before any jax backend use. Safe to call twice (second call
    no-ops).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False  # single-host: nothing to do
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    if num_processes <= 1:
        return False
    if getattr(init_distributed, "_done", False):
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    init_distributed._done = True
    return True


def global_mesh(n_sp: int = 1):
    """A (dp, sp) mesh over every addressable device across all hosts.

    Call after `init_distributed()`. Device order follows `jax.devices()`,
    which groups each host's chips contiguously — so with n_sp <= chips/host
    the sp (deck/TP) axis stays inside one host's ICI domain and only the dp
    axis crosses DCN, matching the SURVEY §2.3 layout guidance.
    """
    from .sharding import make_mesh

    return make_mesh(None, n_sp)
