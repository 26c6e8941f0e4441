"""Serialization round-trips: arkworks byte layouts (SURVEY §2.2 E16) and the
full shuffle-proof (de)serializer — the protocol's checkpoint/persistence
story (every public artifact is byte-serializable, `src/lib.rs:45-71`).
"""

import numpy as np
import pytest

from mental_poker_tpu.crypto import proof_io, serialize as ser
from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.host_curve import STARK
from mental_poker_tpu.utils.rand import GameRng


def test_point_compressed_roundtrip():
    import random

    rng = random.Random(77)
    for _ in range(8):
        P = STARK.rand_point(rng)
        b = ser.point_to_bytes_compressed(P, STARK)
        assert len(b) == ser.compressed_point_size(STARK) == 32
        assert ser.point_from_bytes_compressed(b, STARK) == P
    b = ser.point_to_bytes_compressed(STARK.identity, STARK)
    assert ser.point_from_bytes_compressed(b, STARK) == STARK.identity


def test_tobytes_layout():
    import random

    rng = random.Random(78)
    P = STARK.rand_point(rng)
    b = ser.point_to_bytes(P, STARK)
    # x || y || infinity-byte, 32-byte LE field reprs for the 252-bit prime
    assert len(b) == 32 + 32 + 1
    assert int.from_bytes(b[:32], "little") == P[0]
    assert int.from_bytes(b[32:64], "little") == P[1]
    assert b[64] == 0
    bi = ser.point_to_bytes(STARK.identity, STARK)
    assert bi[64] == 1


@pytest.fixture(scope="module")
def shuffle_proof():
    proto = DLCards()
    rng = GameRng(31337)
    m, n = 2, 4
    pp = proto.setup(rng, m, n)
    pk, sk = proto.player_keygen(rng, pp)
    kp = proto.prove_key_ownership(rng, pp, pk, sk, b"s")
    agg = proto.compute_aggregate_key(pp, [(pk, kp, b"s")])
    deck = elgamal.rand_ciphertexts(proto.cv, rng, m * n)
    pi = rng.permutation(m * n)
    rho = [rng.scalar(proto.cv.host.order) for _ in range(m * n)]
    shuffled, proof = proto.shuffle_and_remask(rng, pp, agg, deck, rho, pi)
    return proto, pp, agg, deck, shuffled, proof


def test_shuffle_proof_roundtrip(shuffle_proof):
    proto, pp, agg, deck, shuffled, proof = shuffle_proof
    blob = proof_io.shuffle_to_bytes(proof, proto.cv.host)
    back = proof_io.shuffle_from_bytes(blob, proto.cv.host)
    assert proof_io.shuffle_to_bytes(back, proto.cv.host) == blob
    # the deserialized proof still verifies
    proto.verify_shuffle(pp, agg, deck, shuffled, back)


def test_shuffle_proof_size_model(shuffle_proof):
    """Proof size tracks the reference's analytic model ~6m|G| + 4n|Z|
    (`parameter_selection.rs:4-5`) within small constants."""
    proto, pp, agg, deck, shuffled, proof = shuffle_proof
    size = proof_io.shuffle_proof_size(proof, proto.cv.host)
    G = ser.compressed_point_size(proto.cv.host)
    Z = ser.scalar_size(proto.cv.host)
    m, n = pp.m, pp.n
    model = 6 * m * G + 4 * n * Z
    assert size < 6 * model  # same order of magnitude, small-m overhead allowed
