"""Multi-device sharding tests on the virtual 8-device CPU mesh (SURVEY §4:
the multi-device coverage the reference lacks). Verifies that the dp/sp
sharded device steps produce bit-identical results to the single-device path.
"""

import jax
import numpy as np
import pytest

from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.crypto.elgamal import Ciphertexts
from mental_poker_tpu.ops import msm as msm_mod
from mental_poker_tpu.ops.curve import PointP
from mental_poker_tpu.parallel.sharding import (
    make_mesh,
    shard_deck,
    sharded_commit_step,
    sharded_deck_msm,
    sharded_remask_step,
)
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs


@pytest.fixture(scope="module")
def env():
    proto = DLCards()
    rng = GameRng(5150)
    pp = proto.setup(rng, 2, 4)
    pk, sk = proto.player_keygen(rng, pp)
    proof = proto.prove_key_ownership(rng, pp, pk, sk, b"x")
    agg = proto.compute_aggregate_key(pp, [(pk, proof, b"x")])
    return proto, rng, pp, agg


def _deck_batch(proto, rng, batch, N):
    flat = elgamal.rand_ciphertexts(proto.cv, rng, batch * N)

    def rs(P):
        return PointP(
            P.x.reshape(batch, N, -1), P.y.reshape(batch, N, -1), P.z.reshape(batch, N, -1)
        )

    return Ciphertexts(rs(flat.c0), rs(flat.c1))


def test_sharded_remask_matches_single(env):
    proto, rng, pp, agg = env
    cv = proto.cv
    N, batch = 8, 4
    deck = _deck_batch(proto, rng, batch, N)
    pi = np.stack([rng.permutation(N) for _ in range(batch)]).astype(np.int32)
    rho = ints_to_limbs(
        [[rng.scalar(cv.host.order) for _ in range(N)] for _ in range(batch)], cv.fr.L
    )

    mesh = make_mesh(4, 2)
    step = sharded_remask_step(cv, pp.enc.gen_table, agg.table, mesh)
    out = step(shard_deck(mesh, deck), pi, rho)

    # single-device reference
    def permute(coord):
        return np.stack([np.asarray(coord)[b, pi[b]] for b in range(batch)])

    permuted = Ciphertexts(
        PointP(*(permute(c) for c in deck.c0)), PointP(*(permute(c) for c in deck.c1))
    )
    c0 = pp.enc.gen_table.mul(rho)
    c1 = agg.table.mul(rho)
    expect = Ciphertexts(cv.add(permuted.c0, c0), cv.add(permuted.c1, c1))

    eq0 = np.asarray(cv.eq(out.c0, expect.c0))
    eq1 = np.asarray(cv.eq(out.c1, expect.c1))
    assert eq0.all() and eq1.all()


def test_sharded_deck_msm_matches_single(env):
    proto, rng, pp, agg = env
    cv = proto.cv
    N, batch = 8, 4
    deck = _deck_batch(proto, rng, batch, N)
    k = ints_to_limbs(
        [[rng.scalar(cv.host.order) for _ in range(N)] for _ in range(batch)], cv.fr.L
    )

    mesh = make_mesh(4, 2)
    f = sharded_deck_msm(cv, mesh)
    k_sh = jax.device_put(
        k, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp", "sp", None))
    )
    p0, p1 = f(*shard_deck(mesh, deck), k_sh)

    e0 = msm_mod.msm(cv, deck.c0, k)
    e1 = msm_mod.msm(cv, deck.c1, k)
    assert np.asarray(cv.eq(p0, e0)).all()
    assert np.asarray(cv.eq(p1, e1)).all()


def test_sharded_commit_matches_single(env):
    proto, rng, pp, agg = env
    cv = proto.cv
    q = cv.host.order
    batch, m = 4, 2
    vecs = ints_to_limbs(
        [[[rng.scalar(q) for _ in range(pp.n)] for _ in range(m)] for _ in range(batch)],
        cv.fr.L,
    )
    rs = ints_to_limbs([[rng.scalar(q) for _ in range(m)] for _ in range(batch)], cv.fr.L)

    mesh = make_mesh(4, 2)
    commit = sharded_commit_step(pp.commit_key, mesh)
    out = commit(vecs, rs)
    expect = pp.commit_key.commit(vecs, rs)
    assert np.asarray(cv.eq(out, expect)).all()


def test_sharded_window_msm_matches_single(env):
    """TP: Pippenger bucket-window partitioning across the sp axis
    (SURVEY §2.3 TP row) matches the single-device MSM bit-exactly."""
    from mental_poker_tpu.parallel.sharding import sharded_window_msm

    proto, rng, pp, agg = env
    cv = proto.cv
    N, batch = 16, 4
    deck = _deck_batch(proto, rng, batch, N)
    k = ints_to_limbs(
        [[rng.scalar(cv.host.order) for _ in range(N)] for _ in range(batch)], cv.fr.L
    )
    mesh = make_mesh(2, 4)
    f = sharded_window_msm(cv, mesh, axis="sp")
    out = f(deck.c0, k)
    expect = msm_mod.msm(cv, deck.c0, k)
    assert np.asarray(cv.eq(out, expect)).all()


def test_dp_sharded_staged_prove_matches_single(env):
    """DP: the staged Bayer-Groth prove/verify runs with its [B] proof axis
    sharded over the full 8-device mesh; the proof is byte-identical to the
    single-device path and the sharded verify accepts it (VERDICT r2 item 5)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mental_poker_tpu.arguments import device_api, staged

    proto, rng, pp, agg = env
    cv = proto.cv
    m, n = pp.m, pp.n
    N = m * n
    B = 8
    deck = _deck_batch(proto, rng, B, N)
    pi = np.stack([rng.permutation(N) for _ in range(B)]).astype(np.int32)
    rho = ints_to_limbs(
        [[rng.scalar(cv.host.order) for _ in range(N)] for _ in range(B)], cv.fr.L
    )
    keys = device_api.make_keys(pp, agg)
    rand = device_api.sample_shuffle_rand(rng, m, n, cv.fr.L, cv.host.order, batch=B)

    # shuffle deck -> deck_out (plain single-device remask)
    permuted = jax.tree.map(
        lambda a: np.stack([np.asarray(a)[b, pi[b]] for b in range(B)]), deck
    )
    zero_enc = elgamal.encrypt_zero(pp.enc, agg.table, rho)
    deck_out = elgamal.cipher_add(cv, permuted, zero_enc)

    ss = staged.get_staged(cv, m, n)
    ref_proof = ss.prove(keys, deck, deck_out, pi, rho, rand)
    ref_checks = ss.verify(keys, deck, deck_out, ref_proof)
    assert all(bool(np.asarray(c).all()) for c in ref_checks)

    mesh = make_mesh(4, 2)

    def shard(a):  # batch axis split over ALL devices (dp x sp)
        a = jax.numpy.asarray(a)
        return jax.device_put(a, NamedSharding(mesh, P(("dp", "sp"),) + (None,) * (a.ndim - 1)))

    deck_sh = jax.tree.map(shard, deck)
    out_sh = jax.tree.map(shard, deck_out)
    rand_sh = jax.tree.map(shard, rand)
    proof_sh = ss.prove(keys, deck_sh, out_sh, shard(pi), shard(rho), rand_sh)
    checks_sh = ss.verify(keys, deck_sh, out_sh, proof_sh)
    assert all(bool(np.asarray(c).all()) for c in checks_sh)

    for a, b in zip(jax.tree.leaves(ref_proof), jax.tree.leaves(proof_sh)):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_sharded_prefix_prod_matches_single(env):
    """SP: modular prefix products with the sequence axis sharded across the
    mesh (product-argument building block at large N) match the in-chip scan."""
    from mental_poker_tpu.parallel.sharding import sharded_prefix_prod

    proto, rng, pp, agg = env
    cv = proto.cv
    fr = cv.fr
    B, N = 4, 16
    vals = ints_to_limbs(
        [[rng.scalar(cv.host.order) for _ in range(N)] for _ in range(B)], fr.L
    )
    a_m = fr.to_mont(jax.numpy.asarray(vals))
    mesh = make_mesh(2, 4)
    f = sharded_prefix_prod(fr, mesh, axis="sp")
    out = f(a_m)
    moved = jax.numpy.moveaxis(a_m, 1, 0)
    expect = jax.numpy.moveaxis(fr._prefix_prod_scan(moved), 0, 1)
    assert (np.asarray(out) == np.asarray(expect)).all()
