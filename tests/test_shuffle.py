"""Shuffle argument end-to-end (mirrors reference `tests.rs:176-227`):
honest shuffle verifies; substituting a random output deck fails with
exactly `"Hadamard Product (5.1)"`.

Scaled to m=2, n=4 for CI; the 52-card canonical shape runs in the e2e model
tests / bench.
"""

import pytest

from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.crypto.errors import HADAMARD, ProofVerificationError
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng

M, N_ = 2, 4


@pytest.fixture(scope="module")
def env():
    proto = DLCards()
    rng = GameRng(4242)
    pp = proto.setup(rng, M, N_)
    players = []
    infos = []
    for _ in range(3):
        pk, sk = proto.player_keygen(rng, pp)
        info = rng.bytes(4)
        proof = proto.prove_key_ownership(rng, pp, pk, sk, info)
        players.append((pk, sk, info))
        infos.append((pk, proof, info))
    agg = proto.compute_aggregate_key(pp, infos)
    return proto, rng, pp, agg


def test_shuffle_roundtrip(env):
    proto, rng, pp, agg = env
    cv = proto.cv
    N = M * N_
    deck = elgamal.rand_ciphertexts(cv, rng, N)
    permutation = rng.permutation(N)
    masking_factors = [rng.scalar(cv.host.order) for _ in range(N)]

    shuffled, proof = proto.shuffle_and_remask(
        rng, pp, agg, deck, masking_factors, permutation
    )
    proto.verify_shuffle(pp, agg, deck, shuffled, proof)  # no raise

    wrong = elgamal.rand_ciphertexts(cv, rng, N)
    with pytest.raises(ProofVerificationError) as ei:
        proto.verify_shuffle(pp, agg, deck, wrong, proof)
    assert ei.value.name == HADAMARD


def test_shuffle_batched_protocol(env):
    """Native [B] batching through the protocol API (VERDICT r2 item 4):
    B decks proved+verified in ONE shuffle_and_remask/verify_shuffle call."""
    import numpy as np
    import jax

    proto, rng, pp, agg = env
    cv = proto.cv
    N = M * N_
    B = 32
    flat = elgamal.rand_ciphertexts(cv, rng, B * N)
    deck = jax.tree.map(lambda a: a.reshape((B, N) + a.shape[1:]), flat)
    pi = np.stack([rng.permutation(N) for _ in range(B)])
    rho = [[rng.scalar(cv.host.order) for _ in range(N)] for _ in range(B)]

    shuffled, proof = proto.shuffle_and_remask(
        rng, pp, agg, deck, rho, pi, device_proof=True
    )
    assert shuffled.c0.x.shape[:2] == (B, N)
    assert proof.c_a.x.shape[0] == B
    proto.verify_shuffle(pp, agg, deck, shuffled, proof)  # no raise

    # corrupt ONE deck of the batch: the whole batched verify must fail
    # with the reference-ordered Hadamard error
    bad = jax.tree.map(lambda a: a.at[3].set(a[4]), shuffled)
    with pytest.raises(ProofVerificationError) as ei:
        proto.verify_shuffle(pp, agg, deck, bad, proof)
    assert ei.value.name == HADAMARD
