"""Determinism assertions (SURVEY §5 "race detection / sanitizers" row).

The TPU story for replay/debugging is bitwise determinism: the prover is a
pure function of (statement, witness, sampled randomness) — same inputs must
give the SAME proof, down to the serialized bytes, across separate jit
dispatches. Cross-replica consistency (DP-sharded prove == single-device
prove) is covered in test_parallel.py; this file pins single-device
run-to-run and serialization determinism. Reference behavior: arkworks
provers are deterministic given the rng stream (`ChaCha20Rng::from_seed`,
`/root/reference/barnett-smart-card-protocol/src/discrete_log_cards/tests.rs:30-40`).
"""

import jax
import numpy as np

from mental_poker_tpu.arguments import device_api
from mental_poker_tpu.crypto import elgamal, proof_io
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs

M, N_COLS = 2, 4
N = M * N_COLS


def _setup():
    proto = DLCards()
    rng = GameRng(1234)
    pp = proto.setup(rng, M, N_COLS)
    pk, sk = proto.player_keygen(rng, pp)
    proof = proto.prove_key_ownership(rng, pp, pk, sk, b"d1")
    agg = proto.compute_aggregate_key(pp, [(pk, proof, b"d1")])
    deck = elgamal.rand_ciphertexts(proto.cv, rng, N)
    pi = rng.permutation(N)
    rho = [rng.scalar(proto.cv.host.order) for _ in range(N)]
    shuffled, _ = proto.shuffle_and_remask(rng, pp, agg, deck, rho, pi)
    return proto, pp, agg, deck, pi, rho, shuffled


def _prove_once(proto, pp, agg, deck, shuffled, pi, rho, seed):
    cv = proto.cv
    keys = device_api.make_keys(pp, agg)
    # fresh-but-identical randomness stream both times
    rand = device_api.sample_shuffle_rand(
        GameRng(seed), M, N_COLS, cv.fr.L, cv.host.order, batch=1
    )
    rho_c = ints_to_limbs(rho, cv.fr.L)[None]
    b = lambda cts: jax.tree.map(lambda a: a[None], cts)
    return device_api.prove_shuffle(
        cv, M, N_COLS, keys, b(deck), b(shuffled),
        np.asarray(pi, np.int32)[None], rho_c, rand,
    )


def test_prove_bitwise_deterministic():
    proto, pp, agg, deck, pi, rho, shuffled = _setup()
    p1 = _prove_once(proto, pp, agg, deck, shuffled, pi, rho, seed=9)
    p2 = _prove_once(proto, pp, agg, deck, shuffled, pi, rho, seed=9)
    l1, t1 = jax.tree.flatten(p1)
    l2, t2 = jax.tree.flatten(p2)
    assert t1 == t2
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serialized_proof_bytes_deterministic():
    proto, pp, agg, deck, pi, rho, shuffled = _setup()
    cv = proto.cv
    p1 = _prove_once(proto, pp, agg, deck, shuffled, pi, rho, seed=5)
    p2 = _prove_once(proto, pp, agg, deck, shuffled, pi, rho, seed=5)
    b1 = proof_io.shuffle_to_bytes(device_api.dev_proof_to_host(cv, p1), cv.host)
    b2 = proof_io.shuffle_to_bytes(device_api.dev_proof_to_host(cv, p2), cv.host)
    assert b1 == b2
