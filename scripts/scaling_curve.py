"""DP scaling curve for the staged Bayer-Groth prove+verify (VERDICT r4 #6).

Runs the full staged prove+verify with the [B] proof axis sharded over a
dp-device mesh for dp in {1, 2, 4, 8} at FIXED total batch, and reports the
wall-clock overhead of sharding vs the dp=1 run.

Interpretation on this host: the 8 "devices" are virtual XLA:CPU devices
multiplexed onto 2 physical cores, so *speedup* is not observable here — what
this pins down is the COMMUNICATION STRUCTURE: DP sharding of the proof axis
is embarrassingly parallel (no cross-device collectives in the math, only
the final unsharded read), so the sharded programs should run at ~the
unsharded wall clock. A large overhead fraction would mean XLA inserted real
collectives (a sharding bug). On real multi-chip ICI the same programs scale
by device count (BASELINE config 5 mechanism; see docs/PERF.md).

Usage: [MPTPU_SCALING_B=8] python scripts/scaling_curve.py
Prints one JSON line per dp point + a summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU mesh: force 8 virtual devices BEFORE jax import (same as tests/conftest)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags.strip()

from mental_poker_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mental_poker_tpu.arguments import device_api, staged
from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.parallel.sharding import make_mesh
from mental_poker_tpu.ops.curve import PointP
from mental_poker_tpu.crypto.elgamal import Ciphertexts
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs

M, NCOLS = 2, 4
B = int(os.environ.get("MPTPU_SCALING_B", "8"))
REPS = int(os.environ.get("MPTPU_SCALING_REPS", "3"))


def main():
    proto = DLCards()
    rng = GameRng(4242)
    pp = proto.setup(rng, M, NCOLS)
    pk, sk = proto.player_keygen(rng, pp)
    kproof = proto.prove_key_ownership(rng, pp, pk, sk, b"s")
    agg = proto.compute_aggregate_key(pp, [(pk, kproof, b"s")])
    cv = proto.cv
    N = M * NCOLS
    keys = device_api.make_keys(pp, agg)
    ss = staged.get_staged(cv, M, NCOLS)
    q = cv.host.order

    flat = elgamal.rand_ciphertexts(cv, rng, B * N)
    rs = lambda Pt: PointP(
        Pt.x.reshape(B, N, -1), Pt.y.reshape(B, N, -1), Pt.z.reshape(B, N, -1)
    )
    deck = Ciphertexts(rs(flat.c0), rs(flat.c1))
    pi = np.stack([rng.permutation(N) for _ in range(B)]).astype(np.int32)
    rho = ints_to_limbs([[rng.scalar(q) for _ in range(N)] for _ in range(B)], cv.fr.L)
    permuted = jax.tree.map(
        lambda a: np.stack([np.asarray(a)[b, pi[b]] for b in range(B)]), deck
    )
    zero_enc = elgamal.encrypt_zero(pp.enc, agg.table, rho)
    deck_out = elgamal.cipher_add(cv, permuted, zero_enc)
    rand = device_api.sample_shuffle_rand(rng, M, NCOLS, cv.fr.L, q, batch=B)

    results = []
    base_wall = None
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(dp, 1)

        def shard(a):
            a = jax.numpy.asarray(a)
            return jax.device_put(
                a, NamedSharding(mesh, P("dp",) + (None,) * (a.ndim - 1))
            )

        d_sh = jax.tree.map(shard, deck)
        o_sh = jax.tree.map(shard, deck_out)
        r_sh = jax.tree.map(shard, rand)
        pi_sh, rho_sh = shard(pi), shard(rho)

        def one():
            proof = ss.prove(keys, d_sh, o_sh, pi_sh, rho_sh, r_sh)
            checks = ss.verify(keys, d_sh, o_sh, proof)
            jax.block_until_ready(checks)
            assert all(bool(np.asarray(c).all()) for c in checks), f"dp={dp} failed"

        one()  # compile/warm
        t0 = time.perf_counter()
        for _ in range(REPS):
            one()
        wall = (time.perf_counter() - t0) / REPS
        if base_wall is None:
            base_wall = wall
        row = {
            "dp": dp,
            "total_B": B,
            "wall_s": round(wall, 3),
            "pairs_per_s": round(B / wall, 3),
            "overhead_vs_dp1": round(wall / base_wall - 1.0, 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "dp_scaling_overhead",
        "note": "fixed total B sharded over dp virtual CPU devices; "
                "overhead ~0 => no spurious collectives in the DP path",
        "max_overhead": max(r["overhead_vs_dp1"] for r in results),
    }))


if __name__ == "__main__":
    main()
