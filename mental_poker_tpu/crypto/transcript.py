"""Fiat-Shamir transcript RNG: Blake2s re-seeding + ChaCha20 keystream.

Mirrors `ark_marlin::rng::FiatShamirRng<Blake2s>` (ark-marlin 0.3), the
transcript type the reference threads through every prover/verifier
(`src/discrete_log_cards/mod.rs:9,139-140,202,...`):

- ``from_seed(bytes)``: ``seed = Blake2s(bytes)``; a ChaCha20 RNG is keyed
  with the 32-byte seed (counter 0, nonce/stream 0).
- ``absorb(bytes)``: ``seed = Blake2s(bytes || seed)``; ChaCha20 re-keyed.
- Randomness: the ChaCha20 word stream (32-bit little-endian words of
  successive keystream blocks), as produced by ``rand_chacha::ChaChaRng``.
- Field sampling follows arkworks 0.3 ``UniformRand`` for ``Fp``: draw the
  64-bit-word repr via ``next_u64`` (two u32 words, little-endian), mask the
  top word by ``u64::MAX >> REPR_SHAVE_BITS``, reject until < modulus, and
  interpret the accepted words as the **Montgomery representation**.

The five protocol domain-separation seeds are protocol constants copied from
`src/discrete_log_cards/mod.rs:80-84`.

Host-side: transcripts handle a few hundred bytes between device stages, so
Python + hashlib (C Blake2s) is ample; the heavy math stays on device.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# Protocol domain-separation seeds (mod.rs:80-84) — must match the reference.
KEY_OWN_RNG_SEED = b"Key Ownership Proof"
MASKING_RNG_SEED = b"Masking Proof"
REMASKING_RNG_SEED = b"Remasking Proof"
REVEAL_RNG_SEED = b"Reveal Proof"
SHUFFLE_RNG_SEED = b"Shuffle Proof"


def _rotl32(v: int, n: int) -> int:
    return ((v << n) | (v >> (32 - n))) & 0xFFFFFFFF


class ChaCha20Words:
    """ChaCha20 keystream as a sequence of u32 words (rand_chacha semantics).

    Key = 32-byte seed; 64-bit block counter starting at 0; 64-bit nonce 0.
    Words are the 16 output words of each block, in order.
    """

    def __init__(self, key: bytes):
        assert len(key) == 32
        self.key_words = struct.unpack("<8I", key)
        self.counter = 0
        self._buf: list[int] = []

    def _block(self) -> list[int]:
        c = self.counter
        state = [
            0x61707865,
            0x3320646E,
            0x79622D32,
            0x6B206574,
            *self.key_words,
            c & 0xFFFFFFFF,
            (c >> 32) & 0xFFFFFFFF,
            0,
            0,
        ]
        x = list(state)

        def qr(a, b, c_, d):
            x[a] = (x[a] + x[b]) & 0xFFFFFFFF
            x[d] = _rotl32(x[d] ^ x[a], 16)
            x[c_] = (x[c_] + x[d]) & 0xFFFFFFFF
            x[b] = _rotl32(x[b] ^ x[c_], 12)
            x[a] = (x[a] + x[b]) & 0xFFFFFFFF
            x[d] = _rotl32(x[d] ^ x[a], 8)
            x[c_] = (x[c_] + x[d]) & 0xFFFFFFFF
            x[b] = _rotl32(x[b] ^ x[c_], 7)

        for _ in range(10):
            qr(0, 4, 8, 12)
            qr(1, 5, 9, 13)
            qr(2, 6, 10, 14)
            qr(3, 7, 11, 15)
            qr(0, 5, 10, 15)
            qr(1, 6, 11, 12)
            qr(2, 7, 8, 13)
            qr(3, 4, 9, 14)
        out = [(a + b) & 0xFFFFFFFF for a, b in zip(x, state)]
        self.counter += 1
        return out

    def next_u32(self) -> int:
        if not self._buf:
            self._buf = self._block()
        return self._buf.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)

    def keystream(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            out += struct.pack("<I", self.next_u32())
        return bytes(out[:n])


class FiatShamirRng:
    """ark-marlin 0.3 `FiatShamirRng<Blake2s>` semantics."""

    def __init__(self, seed_bytes: bytes):
        self.seed = hashlib.blake2s(seed_bytes).digest()
        self.rng = ChaCha20Words(self.seed)

    def absorb(self, data: bytes) -> None:
        self.seed = hashlib.blake2s(bytes(data) + self.seed).digest()
        self.rng = ChaCha20Words(self.seed)

    def sample_field(self, modulus: int) -> int:
        """arkworks `UniformRand` for Fp: returns the canonical value whose
        Montgomery repr (R = 2^(64*words)) is the accepted uniform bigint."""
        bits = modulus.bit_length()
        words = -(-bits // 64)
        shave = 64 * words - bits
        top_mask = (1 << 64) - 1 >> shave
        R = 1 << (64 * words)
        r_inv = pow(R, -1, modulus)
        while True:
            ws = [self.rng.next_u64() for _ in range(words)]
            ws[-1] &= top_mask
            val = 0
            for i, w in enumerate(ws):
                val |= w << (64 * i)
            if val < modulus:
                return val * r_inv % modulus

    def sample_fields(self, modulus: int, k: int) -> list[int]:
        return [self.sample_field(modulus) for _ in range(k)]


class TranscriptBatch:
    """A batch of B independent Fiat-Shamir transcripts (one per proof).

    The TPU framework proves/verifies many independent statements per step;
    each statement keeps its own reference-compatible transcript. Absorbs and
    challenge draws are vectorized host loops over C-accelerated Blake2s.
    """

    def __init__(self, seeds: list[bytes]):
        self.ts = [FiatShamirRng(s) for s in seeds]

    @classmethod
    def fixed(cls, seed: bytes, batch: int) -> "TranscriptBatch":
        return cls([seed] * batch)

    def __len__(self):
        return len(self.ts)

    def absorb(self, blobs: list[bytes]) -> None:
        assert len(blobs) == len(self.ts)
        for t, b in zip(self.ts, blobs):
            t.absorb(b)

    def sample_field(self, modulus: int) -> list[int]:
        return [t.sample_field(modulus) for t in self.ts]

    def sample_fields(self, modulus: int, k: int) -> list[list[int]]:
        """Returns [B][k] ints."""
        return [t.sample_fields(modulus, k) for t in self.ts]
