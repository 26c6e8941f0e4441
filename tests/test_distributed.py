"""Multi-host communication backend smoke test (SURVEY §2.3 comm row).

The reference has no distributed execution at all; this framework's
equivalent is `jax.distributed.initialize` + a global mesh + XLA collectives
(parallel/distributed.py). Pod hardware is unavailable here, so the test runs
the REAL multi-process path on CPU: 2 OS processes x 2 virtual devices each,
a 4-device global (dp, sp) mesh, and a sharded step whose all_gather crosses
the process boundary (the DCN-analog hop).
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_distributed_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_sharded_step():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS", "MPTPU_CACHE_DIR")
    }
    env.update(
        PYTHONPATH="",  # drop the axon sitecustomize: pure-CPU child
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2 --xla_cpu_max_isa=AVX2",
    )
    if "MPTPU_CACHE_DIR" in os.environ:  # honor test-level cache redirect
        env["MPTPU_CACHE_DIR"] = os.environ["MPTPU_CACHE_DIR"]
    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(port), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed child timed out\n" + "\n---\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DIST OK pid={pid}" in out, out
