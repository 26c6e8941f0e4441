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
  MPTPU_BENCH_BATCH = decks proved per dispatch sequence (default 128)
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
    from mental_poker_tpu.config import get_config

    m, n = (2, 4) if get_config().bench_smoke else (2, 26)
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
    prof_dir = get_config().profile_dir
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            one()
    t0 = time.perf_counter()
    for _ in range(reps):
        one()
    dt = (time.perf_counter() - t0) / reps
    pairs_per_s = batch / dt
    from mental_poker_tpu.config import get_config

    if get_config().stage_timing:
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

    def sync(o):  # device_get barrier: block_until_ready returns early on
        np.asarray(jax.device_get(o.x[..., :1]))  # the relay backend

    out = f(pts, k)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(pts, k)
        sync(out)
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


def bench_multigame(reps: int) -> dict:
    """BASELINE config 4: "8 players, masking/remasking chain + reveal tokens
    + Chaum-Pedersen proofs, 64 games in parallel".

    64 games with INDEPENDENT keys run as one [G, N]-batched device program
    stack (variable-base muls + the device sigma twin, so per-game fixed
    tables are not needed): mask all decks + CP proofs + verify, remask chain
    + CP + verify, all 8 players' reveal tokens + CP + verify, unmask check.

    Baseline: per game ~ N*(9+9) mask/remask exps + P*N*9 reveal-CP exps
    ~ 4.7k 252-bit exps ~ 0.61 s on an arkworks core => ~1.6 games/s.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mental_poker_tpu.crypto import elgamal, sigma_device as sd
    from mental_poker_tpu.crypto import transcript_jax as dt
    from mental_poker_tpu.crypto.transcript import (
        MASKING_RNG_SEED,
        REMASKING_RNG_SEED,
        REVEAL_RNG_SEED,
    )
    from mental_poker_tpu.ops import curve as curve_mod
    from mental_poker_tpu.ops.curve import PointP
    from mental_poker_tpu.utils.rand import GameRng

    G, P, m, n = 64, 8, 2, 26
    N = m * n
    cv = curve_mod.stark_curve()
    fr = cv.fr
    q = cv.host.order
    rng = GameRng(11)

    gens = cv.from_host_points([cv.host.rand_point(rng.rng) for _ in range(G)])
    sks = rng.scalar_limbs(q, (G, P), fr.L)  # per-player secret keys
    # player pks [G, P] and aggregate pk [G] = (sum_p sk_p) * g
    gens_p = PointP(*(jnp.broadcast_to(c[:, None], (G, P, c.shape[-1])) for c in gens))
    pks = cv.scalar_mul(jnp.asarray(sks), gens_p)
    agg_sk_int = [
        sum(int(sum(int(v) << (16 * i) for i, v in enumerate(sks[g, p]))) for p in range(P)) % q
        for g in range(G)
    ]
    from mental_poker_tpu.utils.rand import ints_to_limbs

    agg_sk = ints_to_limbs(agg_sk_int, fr.L)
    agg_pk = cv.scalar_mul(jnp.asarray(agg_sk), gens)  # [G]

    # NB: sigma_device treats 3-dim PointP bases as [W, T, L] window tables,
    # so every per-statement base/statement batch here is FLATTENED to 2-dim
    # [G*N] / [G*P*N] coords (identical math, unambiguous dispatch).
    L = fr.L

    def flat_b(Pt, reps):
        # [G, L] -> [G*reps, L] with each game's point repeated `reps` times
        return PointP(*(jnp.repeat(c, reps, axis=0) for c in Pt))

    g_b = flat_b(gens, N)      # [G*N]
    pk_b = flat_b(agg_pk, N)   # [G*N]
    cards = elgamal.rand_plaintexts(cv, rng, G * N)  # [G*N]

    def flow():
        # ---- mask every deck + CP proofs + batched verify
        alphas = jnp.asarray(rng.scalar_limbs(q, (G * N,), fr.L))
        c0 = cv.scalar_mul(alphas, g_b)
        c1 = cv.add(cards, cv.scalar_mul(alphas, pk_b))
        stmt_b = cv.add(c1, cv.neg(cards))
        st = dt.init(MASKING_RNG_SEED, (G * N,))
        ks = jnp.asarray(rng.scalar_limbs(q, (G * N,), fr.L))
        prf = sd.cp_prove_dev(cv, st, g_b, pk_b, c0, stmt_b, alphas, ks)
        ok_mask = sd.cp_verify_dev(
            cv, dt.init(MASKING_RNG_SEED, (G * N,)), g_b, pk_b, c0, stmt_b, prf
        )

        # ---- remask chain + CP + verify
        betas = jnp.asarray(rng.scalar_limbs(q, (G * N,), fr.L))
        r0 = cv.scalar_mul(betas, g_b)
        r1 = cv.scalar_mul(betas, pk_b)
        d0, d1 = cv.add(c0, r0), cv.add(c1, r1)
        st = dt.init(REMASKING_RNG_SEED, (G * N,))
        ks2 = jnp.asarray(rng.scalar_limbs(q, (G * N,), fr.L))
        prf2 = sd.cp_prove_dev(cv, st, g_b, pk_b, r0, r1, betas, ks2)
        ok_remask = sd.cp_verify_dev(
            cv, dt.init(REMASKING_RNG_SEED, (G * N,)), g_b, pk_b, r0, r1, prf2
        )

        # ---- all 8 players' reveal tokens + CP + verify; unmask check
        M = G * P * N

        def per_player(Pt):  # [G*N] -> [G*P*N] (repeat deck per player)
            return PointP(*(
                jnp.repeat(c.reshape(G, 1, N, L), P, axis=1).reshape(M, L) for c in Pt
            ))

        d0_b = per_player(d0)
        sk_b = jnp.broadcast_to(
            jnp.asarray(sks)[:, :, None, :], (G, P, N, fr.L)
        ).reshape(M, fr.L)
        tokens = cv.scalar_mul(sk_b, d0_b)
        g_bb = flat_b(gens, P * N)
        pk_pl = PointP(*(
            jnp.repeat(c[:, :, None], N, axis=2).reshape(M, L) for c in pks
        ))
        st = dt.init(REVEAL_RNG_SEED, (M,))
        ks3 = jnp.asarray(rng.scalar_limbs(q, (M,), fr.L))
        prf3 = sd.cp_prove_dev(cv, st, d0_b, g_bb, tokens, pk_pl, sk_b, ks3)
        ok_reveal = sd.cp_verify_dev(
            cv, dt.init(REVEAL_RNG_SEED, (M,)), d0_b, g_bb, tokens, pk_pl, prf3
        )

        # unmask: d1 - sum_p token_p recovers the original plaintexts
        tok = PointP(*(c.reshape(G, P, N, L) for c in tokens))
        tok_sum = cv.sum_points(tok, axis=1)  # [G, N]
        flat_sum = PointP(*(c.reshape(G * N, L) for c in tok_sum))
        plain = cv.add(cv.neg(flat_sum), d1)
        ok_plain = cv.eq(plain, cards)
        return ok_mask, ok_remask, ok_reveal, ok_plain

    def one():
        outs = flow()
        jax.block_until_ready(outs)
        for o in outs:
            assert bool(np.asarray(o).all()), "multigame flow check failed"

    one()
    t0 = time.perf_counter()
    for _ in range(reps):
        one()
    dt_s = (time.perf_counter() - t0) / reps
    games_per_s = G / dt_s
    return {
        "metric": "multigame_8p_games_per_s",
        "value": round(games_per_s, 3),
        "unit": "games/s/chip",
        "vs_baseline": round(games_per_s / 1.6, 4),
    }


def main():
    from mental_poker_tpu.config import get_config

    cfg = get_config()
    mode, reps, batch = cfg.bench_mode, cfg.bench_reps, cfg.bench_batch
    if mode == "msm":
        result = bench_msm(reps)
    elif mode == "deck1024":
        result = bench_deck1024(reps)
    elif mode == "multigame":
        result = bench_multigame(reps)
    else:
        result = bench_shuffle52(reps, batch)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
