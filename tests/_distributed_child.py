"""Child process for tests/test_distributed.py (not a pytest module).

Usage: python _distributed_child.py <coordinator_port> <process_id>

Each of the 2 processes brings 2 virtual CPU devices (4 global), initializes
`jax.distributed`, builds the global (dp, sp) mesh, and runs
`sharded_prefix_prod` twice: once with the sequence axis on sp (intra-process
all_gather) and once on dp (CROSS-process all_gather — the DCN-analog path).
Every addressable output shard is checked against a bigint reference.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

port, pid = int(sys.argv[1]), int(sys.argv[2])

from mental_poker_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from mental_poker_tpu.parallel.distributed import init_distributed, global_mesh  # noqa: E402

assert init_distributed(f"localhost:{port}", 2, pid) is True
# second call must no-op, not crash
assert init_distributed(f"localhost:{port}", 2, pid) is True

import jax  # noqa: E402
import numpy as np  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mental_poker_tpu.ops import field as fm  # noqa: E402
from mental_poker_tpu.parallel.sharding import sharded_prefix_prod  # noqa: E402

fq = fm.stark_fq()
L = fq.L
B, N = 2, 8
rng = np.random.default_rng(0)  # same data on both processes
vals = [[int(rng.integers(1, 1 << 62)) for _ in range(N)] for _ in range(B)]
a_mont = np.stack([fq.from_int_array(row) for row in vals])  # [B, N, L] Montgomery

mesh = global_mesh(n_sp=2)
assert mesh.devices.size == 4 and mesh.axis_names == ("dp", "sp")

# bigint reference: inclusive prefix product mod p
expect = np.zeros((B, N), dtype=object)
for b in range(B):
    acc = 1
    for i in range(N):
        acc = acc * vals[b][i] % fq.p
        expect[b, i] = acc


def check(axis: str):
    # [B, N, L]: B on the non-`axis` mesh axis, N on `axis`
    other = [ax for ax in mesh.axis_names if ax != axis][0]
    sharding = NamedSharding(mesh, P(other, axis, None))
    a_dev = jax.make_array_from_callback(
        (B, N, L), sharding, lambda idx: a_mont[idx]
    )
    out = sharded_prefix_prod(fq, mesh, axis=axis)(a_dev)
    out_canon = jax.jit(fq.from_mont)(out)
    for shard in out_canon.addressable_shards:
        got = np.asarray(shard.data)
        idx = shard.index
        want = expect[idx[0], idx[1]]
        for bi in range(got.shape[0]):
            for ni in range(got.shape[1]):
                assert fm.limbs_to_int(got[bi, ni]) == int(want[bi, ni]), (
                    axis, shard.index, bi, ni,
                )


check("sp")  # intra-process all_gather
check("dp")  # cross-process all_gather (the multi-host communication path)
print(f"DIST OK pid={pid}", flush=True)
