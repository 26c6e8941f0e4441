"""Bit-exactness of the device Blake2s/ChaCha20 vs the host implementations
(hashlib / crypto.transcript.ChaCha20Words) — the device transcript is only
correct if these match word-for-word."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from mental_poker_tpu.crypto import hash_jax
from mental_poker_tpu.crypto.transcript import ChaCha20Words


def _dev_blake2s(data: bytes) -> bytes:
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    return bytes(np.asarray(jax.jit(hash_jax.blake2s_bytes)(arr)))


def test_blake2s_matches_hashlib_various_lengths():
    rng = np.random.default_rng(42)
    for n in [0, 1, 31, 32, 33, 63, 64, 65, 127, 128, 200, 1024, 6859]:
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert _dev_blake2s(data) == hashlib.blake2s(data).digest(), n


def test_blake2s_batched():
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, size=(5, 100), dtype=np.uint8)
    out = np.asarray(jax.jit(hash_jax.blake2s_bytes)(jnp.asarray(batch)))
    for i in range(5):
        assert bytes(out[i]) == hashlib.blake2s(batch[i].tobytes()).digest()


def test_chacha20_words_match_host():
    key = hashlib.blake2s(b"chacha test key").digest()
    host = ChaCha20Words(key)
    host_words = [host.next_u32() for _ in range(80)]

    key_words = jnp.asarray(np.frombuffer(key, dtype=np.uint32))
    dev = np.asarray(
        jax.jit(lambda k: hash_jax.chacha20_words(k, jnp.uint32(0), 80))(key_words)
    )
    assert [int(w) for w in dev] == host_words


def test_chacha20_unaligned_start():
    key = hashlib.blake2s(b"another key").digest()
    host = ChaCha20Words(key)
    all_words = [host.next_u32() for _ in range(64)]

    key_words = jnp.asarray(np.frombuffer(key, dtype=np.uint32))
    for start in [0, 5, 8, 16, 23, 40]:
        dev = np.asarray(
            jax.jit(
                lambda k, s: hash_jax.chacha20_words(k, s, 12), static_argnums=()
            )(key_words, jnp.uint32(start))
        )
        assert [int(w) for w in dev] == all_words[start : start + 12], start
