"""Protocol-level tests mirroring the reference's positive/negative pairs
(`src/discrete_log_cards/tests.rs`, `masking.rs:22-108`, `remasking.rs:24-115`,
`reveal.rs:22-85`) with the exact reference error strings.

Deck shape is scaled down (m=2, n=4) for CI speed; the canonical 52-card flow
runs in the integration/e2e model tests.
"""

import numpy as np
import pytest

from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.crypto.errors import (
    CHAUM_PEDERSEN,
    SCHNORR,
    CardProtocolError,
    ProofVerificationError,
)
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng

M, N_ = 2, 4
NUM_PLAYERS = 4


@pytest.fixture(scope="module")
def proto():
    return DLCards()


@pytest.fixture(scope="module")
def rng():
    return GameRng(2024)


@pytest.fixture(scope="module")
def pp(proto, rng):
    return proto.setup(rng, M, N_)


@pytest.fixture(scope="module")
def players(proto, rng, pp):
    out = []
    for _ in range(NUM_PLAYERS):
        pk, sk = proto.player_keygen(rng, pp)
        info = rng.bytes(8)
        out.append((pk, sk, info))
    return out


@pytest.fixture(scope="module")
def aggregate(proto, rng, pp, players):
    infos = [
        (pk, proto.prove_key_ownership(rng, pp, pk, sk, info), info)
        for pk, sk, info in players
    ]
    return proto.compute_aggregate_key(pp, infos)


def test_generate_and_verify_key(proto, rng, pp):
    pk, sk = proto.player_keygen(rng, pp)
    name = b"Alice"
    proof = proto.prove_key_ownership(rng, pp, pk, sk, name)
    proto.verify_key_ownership(pp, pk, name, proof)  # no raise

    other_sk = rng.scalar(proto.cv.host.order)
    wrong = proto.prove_key_ownership(rng, pp, pk, other_sk, name)
    with pytest.raises(ProofVerificationError) as ei:
        proto.verify_key_ownership(pp, pk, name, wrong)
    assert ei.value.name == SCHNORR


def test_aggregate_keys(proto, rng, pp, players):
    infos = [
        (pk, proto.prove_key_ownership(rng, pp, pk, sk, info), info)
        for pk, sk, info in players
    ]
    agg = proto.compute_aggregate_key(pp, infos)
    expect = proto.cv.host.identity
    for pk, _, _ in infos:
        expect = proto.cv.host.add(expect, pk)
    assert agg.host == expect

    bad = [(infos[0][0], infos[0][1], infos[0][2])] + infos[1:]
    bad[0] = (proto.cv.host.identity, infos[0][1], infos[0][2])
    with pytest.raises(CardProtocolError) as ei:
        proto.compute_aggregate_key(pp, bad)
    assert isinstance(ei.value.inner, ProofVerificationError)
    assert ei.value.inner.name == SCHNORR


def test_verify_masking(proto, rng, pp, aggregate):
    cards = elgamal.rand_plaintexts(proto.cv, rng, 3)
    alphas = [rng.scalar(proto.cv.host.order) for _ in range(3)]
    masked, proof = proto.mask(rng, pp, aggregate, cards, alphas)
    proto.verify_mask(pp, aggregate, cards, masked, proof)  # no raise

    wrong = elgamal.rand_ciphertexts(proto.cv, rng, 3)
    with pytest.raises(ProofVerificationError) as ei:
        proto.verify_mask(pp, aggregate, cards, wrong, proof)
    assert ei.value.name == CHAUM_PEDERSEN


def test_verify_remasking(proto, rng, pp, aggregate):
    original = elgamal.rand_ciphertexts(proto.cv, rng, 3)
    alphas = [rng.scalar(proto.cv.host.order) for _ in range(3)]
    remasked, proof = proto.remask(rng, pp, aggregate, original, alphas)
    proto.verify_remask(pp, aggregate, original, remasked, proof)  # no raise

    wrong = elgamal.rand_ciphertexts(proto.cv, rng, 3)
    with pytest.raises(ProofVerificationError) as ei:
        proto.verify_remask(pp, aggregate, original, wrong, proof)
    assert ei.value.name == CHAUM_PEDERSEN


def test_verify_reveal(proto, rng, pp, players):
    pk, sk, _ = players[0]
    masked = elgamal.rand_ciphertexts(proto.cv, rng, 2)
    token, proof = proto.compute_reveal_token(rng, pp, sk, pk, masked)
    proto.verify_reveal(pp, pk, token, masked, proof)  # no raise

    wrong_token = elgamal.rand_plaintexts(proto.cv, rng, 2)
    with pytest.raises(ProofVerificationError) as ei:
        proto.verify_reveal(pp, pk, wrong_token, masked, proof)
    assert ei.value.name == CHAUM_PEDERSEN


def test_unmask(proto, rng, pp, players, aggregate):
    cv = proto.cv
    cards = elgamal.rand_plaintexts(cv, rng, 2)
    alphas = [rng.scalar(cv.host.order) for _ in range(2)]
    masked, _ = proto.mask(rng, pp, aggregate, cards, alphas)

    decryption_key = []
    for pk, sk, _ in players:
        token, proof = proto.compute_reveal_token(rng, pp, sk, pk, masked)
        decryption_key.append((token, proof, pk))

    unmasked = proto.unmask(pp, decryption_key, masked)
    assert bool(np.asarray(cv.eq(unmasked, cards)).all())

    bad_key = list(decryption_key)
    tok0, proof0, pk0 = bad_key[0]
    bad_key[0] = (elgamal.rand_plaintexts(cv, rng, 2), proof0, pk0)
    with pytest.raises(CardProtocolError) as ei:
        proto.unmask(pp, bad_key, masked)
    assert isinstance(ei.value.inner, ProofVerificationError)
    assert ei.value.inner.name == CHAUM_PEDERSEN
