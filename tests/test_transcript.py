"""Transcript primitives: ChaCha20 against the well-known zero-key vector,
Blake2s against hashlib, FiatShamirRng semantics and determinism."""

import hashlib

from mental_poker_tpu.crypto.transcript import ChaCha20Words, FiatShamirRng
from mental_poker_tpu.ops.field import STARK_R, STARK_P


def test_chacha20_zero_key_vector():
    # First keystream block of ChaCha20 with zero key, zero nonce, counter 0.
    ks = ChaCha20Words(b"\x00" * 32).keystream(32)
    assert ks.hex() == (
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7"
    )


def test_chacha20_counter_advances():
    c = ChaCha20Words(b"\x01" * 32)
    a = [c.next_u32() for _ in range(20)]
    c2 = ChaCha20Words(b"\x01" * 32)
    b = c2.keystream(80)
    import struct

    assert a == list(struct.unpack("<20I", b))


def test_fs_rng_seed_is_blake2s():
    fs = FiatShamirRng(b"Shuffle Proof")
    assert fs.seed == hashlib.blake2s(b"Shuffle Proof").digest()
    old = fs.seed
    fs.absorb(b"hello")
    assert fs.seed == hashlib.blake2s(b"hello" + old).digest()


def test_fs_rng_deterministic_and_domain_separated():
    a = FiatShamirRng(b"seed-one")
    b = FiatShamirRng(b"seed-one")
    c = FiatShamirRng(b"seed-two")
    xa = a.sample_field(STARK_R)
    xb = b.sample_field(STARK_R)
    xc = c.sample_field(STARK_R)
    assert xa == xb
    assert xa != xc
    assert 0 <= xa < STARK_R


def test_fs_rng_absorb_changes_stream():
    a = FiatShamirRng(b"seed")
    b = FiatShamirRng(b"seed")
    _ = a.sample_field(STARK_R)
    b.absorb(b"data")
    assert a.sample_field(STARK_R) != b.sample_field(STARK_R)


def test_sample_many_in_range():
    fs = FiatShamirRng(b"x")
    for p in (STARK_R, STARK_P):
        for v in fs.sample_fields(p, 20):
            assert 0 <= v < p
