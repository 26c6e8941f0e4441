"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): Bayer-Groth 52-card shuffle prove+verify throughput
(proofs/sec/chip) on the canonical game shape m=2, n=26, Stark curve — the
reference's `examples/round.rs:229-231` configuration.

Measurement: the staged device-resident prover/verifier
(mental_poker_tpu/arguments/staged.py) over a batch of B independent decks —
the batch-first design proves B shuffles per stage-program dispatch sequence,
which is the honest per-chip throughput number for a proving service. Set
MPTPU_BENCH_BATCH=1 for single-proof latency mode.

`vs_baseline` compares against the arkworks/Rust reference running the same
(m, n) = (2, 26) shuffle on one CPU core. The reference publishes no numbers
(BASELINE.md), and this container has no Rust toolchain to measure it, so the
baseline constant below is an analytic estimate from the reference's own cost
model (`parameter_selection.rs:3`): prover ~ m*N + ~6N exponentiations + 2N
remask exps ~ 700 variable-base 252-bit exps at ~130 us each (arkworks 0.3
class hardware) plus verifier ~ same order => ~0.2 s per prove+verify pair,
i.e. ~5 pairs/sec. Replace with a measured number when a Rust host is
available.

Env knobs:
  MPTPU_BENCH_MODE  = shuffle52 (default) | msm
  MPTPU_BENCH_REPS  = timed repetitions (default 3)
  MPTPU_BENCH_BATCH = decks proved per dispatch sequence (default 8)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 8-bit fixed-base windows: half the gathered points per multiply; the 16x
# bigger one-time table build is noise on TPU (see ops/msm.py).
os.environ.setdefault("MPTPU_FIXED_WINDOW", "8")

from mental_poker_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

ARKWORKS_CPU_SHUFFLE52_PAIRS_PER_S = 5.0  # analytic estimate; see module doc


def bench_shuffle52(reps: int, batch: int) -> dict:
    import jax
    import numpy as np

    from mental_poker_tpu.arguments import device_api, staged
    from mental_poker_tpu.crypto import elgamal
    from mental_poker_tpu.crypto.elgamal import Ciphertexts
    from mental_poker_tpu.ops.curve import PointP
    from mental_poker_tpu.protocol.dl_cards import DLCards
    from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs

    # Smoke mode (scripts/ci.sh): tiny shape so the CPU backend compiles fast.
    m, n = (2, 4) if os.environ.get("MPTPU_BENCH_SMOKE") else (2, 26)
    N = m * n
    proto = DLCards()
    rng = GameRng(1234)
    pp = proto.setup(rng, m, n)
    pk, sk = proto.player_keygen(rng, pp)
    info = b"bench"
    kproof = proto.prove_key_ownership(rng, pp, pk, sk, info)
    agg = proto.compute_aggregate_key(pp, [(pk, kproof, info)])
    cv = proto.cv
    keys = device_api.make_keys(pp, agg)
    ss = staged.get_staged(cv, m, n)
    q = cv.host.order

    flat = elgamal.rand_ciphertexts(cv, rng, batch * N)

    def rs(P):
        return PointP(
            P.x.reshape(batch, N, -1), P.y.reshape(batch, N, -1), P.z.reshape(batch, N, -1)
        )

    deck = Ciphertexts(rs(flat.c0), rs(flat.c1))
    pi = np.stack([rng.permutation(N) for _ in range(batch)]).astype(np.int32)
    rho = ints_to_limbs(
        [[rng.scalar(q) for _ in range(N)] for _ in range(batch)], cv.fr.L
    )
    # device permute+remask (the deck hot path), batched
    permuted = jax.tree.map(
        lambda a: jax.numpy.take_along_axis(
            a, jax.numpy.asarray(pi)[..., None].astype(jax.numpy.int32), axis=1
        ),
        deck,
    )
    zero_enc = elgamal.encrypt_zero(pp.enc, agg.table, rho)
    shuffled = elgamal.cipher_add(cv, permuted, zero_enc)
    jax.block_until_ready(shuffled)

    def one():
        rand = device_api.sample_shuffle_rand(rng, m, n, cv.fr.L, q, batch=batch)
        proof = ss.prove(keys, deck, shuffled, jax.numpy.asarray(pi), rho, rand)
        checks = ss.verify(keys, deck, shuffled, proof)
        jax.block_until_ready(checks)
        ok = all(bool(np.asarray(c).all()) for c in checks)
        assert ok, "bench proof failed to verify"

    one()  # warmup / compile
    prof_dir = os.environ.get("MPTPU_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            one()
    t0 = time.perf_counter()
    for _ in range(reps):
        one()
    dt = (time.perf_counter() - t0) / reps
    pairs_per_s = batch / dt
    if os.environ.get("MPTPU_STAGE_TIMING"):
        print(f"# prove+verify: {dt*1e3:.1f} ms per {batch}-deck batch", file=sys.stderr)
        for key, steady_ms, calls, first in staged.stage_report():
            print(
                f"# stage {key[0]:<10} {str(key[4:]):<12} {steady_ms:9.2f} ms/call"
                f"  x{calls}  (first {first:.2f} s)",
                file=sys.stderr,
            )
    return {
        "metric": "shuffle52_prove_verify_pairs_per_s",
        "value": round(pairs_per_s, 4),
        "unit": "proofs/s/chip",
        "vs_baseline": round(pairs_per_s / ARKWORKS_CPU_SHUFFLE52_PAIRS_PER_S, 4),
    }


def bench_msm(reps: int) -> dict:
    """Variable-base MSM points/sec on a 1024-point batch (stress config)."""
    import jax
    import numpy as np

    from mental_poker_tpu.crypto import elgamal
    from mental_poker_tpu.ops import curve as curve_mod, msm as msm_mod
    from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs

    cv = curve_mod.stark_curve()
    rng = GameRng(7)
    NPTS = 1024
    pts = elgamal.rand_plaintexts(cv, rng, NPTS)
    k = ints_to_limbs([rng.scalar(cv.host.order) for _ in range(NPTS)], cv.fr.L)

    f = jax.jit(lambda P, s: msm_mod.msm(cv, P, s))
    out = f(pts, k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(pts, k)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    pps = NPTS / dt
    # arkworks CPU Pippenger ~ 6 us/point at 2^10 (252-bit) => ~170k pts/s
    return {
        "metric": "msm_1024_points_per_s",
        "value": round(pps, 1),
        "unit": "points/s/chip",
        "vs_baseline": round(pps / 170_000.0, 4),
    }


def bench_deck1024(reps: int) -> dict:
    """BASELINE stress config: one 1024-card deck (m=16, n=64) Bayer-Groth
    prove+verify. The arkworks single-core estimate scales the 52-card cost
    by prover work m*N + ~8N exps (parameter_selection.rs:3): ~25k exps
    ~ 3.3 s/pair => ~0.3 pairs/s."""
    os.environ["MPTPU_BENCH_SMOKE"] = ""  # full shape
    return _bench_shuffle_shape(16, 64, reps, batch=1,
                                metric="deck1024_prove_verify_pairs_per_s",
                                baseline_pairs_per_s=0.3)


def _bench_shuffle_shape(m, n, reps, batch, metric, baseline_pairs_per_s):
    import jax
    import numpy as np

    from mental_poker_tpu.arguments import device_api, staged
    from mental_poker_tpu.crypto import elgamal
    from mental_poker_tpu.crypto.elgamal import Ciphertexts
    from mental_poker_tpu.ops.curve import PointP
    from mental_poker_tpu.protocol.dl_cards import DLCards
    from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs

    N = m * n
    proto = DLCards()
    rng = GameRng(99)
    pp = proto.setup(rng, m, n)
    pk, sk = proto.player_keygen(rng, pp)
    kproof = proto.prove_key_ownership(rng, pp, pk, sk, b"b")
    agg = proto.compute_aggregate_key(pp, [(pk, kproof, b"b")])
    cv = proto.cv
    keys = device_api.make_keys(pp, agg)
    ss = staged.get_staged(cv, m, n)
    q = cv.host.order

    flat = elgamal.rand_ciphertexts(cv, rng, batch * N)
    rs = lambda P: PointP(
        P.x.reshape(batch, N, -1), P.y.reshape(batch, N, -1), P.z.reshape(batch, N, -1)
    )
    deck = Ciphertexts(rs(flat.c0), rs(flat.c1))
    pi = np.stack([rng.permutation(N) for _ in range(batch)]).astype(np.int32)
    rho = ints_to_limbs(
        [[rng.scalar(q) for _ in range(N)] for _ in range(batch)], cv.fr.L
    )
    permuted = jax.tree.map(
        lambda a: jax.numpy.take_along_axis(
            a, jax.numpy.asarray(pi)[..., None].astype(jax.numpy.int32), axis=1
        ),
        deck,
    )
    zero_enc = elgamal.encrypt_zero(pp.enc, agg.table, rho)
    shuffled = elgamal.cipher_add(cv, permuted, zero_enc)
    jax.block_until_ready(shuffled)

    def one():
        rand = device_api.sample_shuffle_rand(rng, m, n, cv.fr.L, q, batch=batch)
        proof = ss.prove(keys, deck, shuffled, jax.numpy.asarray(pi), rho, rand)
        checks = ss.verify(keys, deck, shuffled, proof)
        jax.block_until_ready(checks)
        assert all(bool(np.asarray(c).all()) for c in checks), "bench proof failed"

    one()
    t0 = time.perf_counter()
    for _ in range(reps):
        one()
    dt = (time.perf_counter() - t0) / reps
    pairs_per_s = batch / dt
    return {
        "metric": metric,
        "value": round(pairs_per_s, 4),
        "unit": "proofs/s/chip",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 4),
    }


def main():
    mode = os.environ.get("MPTPU_BENCH_MODE", "shuffle52")
    reps = int(os.environ.get("MPTPU_BENCH_REPS", "3"))
    batch = int(os.environ.get("MPTPU_BENCH_BATCH", "8"))
    if mode == "msm":
        result = bench_msm(reps)
    elif mode == "deck1024":
        result = bench_deck1024(reps)
    else:
        result = bench_shuffle52(reps, batch)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
