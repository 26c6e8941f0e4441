"""Host randomness utilities (role of `ark_std::rand` + proof-essentials
`utils::rand::sample_vector` / `utils::permutation::Permutation` in the
reference — use-sites `tests.rs:11,187-190`, `lib.rs:8,187`).

Security model matches the reference's `thread_rng()` (an OS-seeded CSPRNG,
`tests.rs:51`, `round.rs:233`): the DEFAULT `GameRng()` draws from the OS
CSPRNG (`random.SystemRandom` / `os.urandom`), because permutations, masking
factors and every sigma/Bayer-Groth blinding factor sampled here are exactly
the secrets whose unpredictability the protocol's security rests on.

The SEEDED mode (`GameRng(seed)`) exists for reproducible tests/benches only.
It is backed by a ChaCha20 keystream (reusing the transcript's ChaCha core),
not a Mersenne Twister — so even seeded runs never route protocol secrets
through a generator whose state is recoverable from ~624 outputs.
"""

from __future__ import annotations

import hashlib
import os
import random
import secrets

import numpy as np

from ..ops.field import int_to_limbs


class ChaChaRandom(random.Random):
    """Deterministic `random.Random` API over a ChaCha20 keystream.

    Used for the seeded (reproducible) `GameRng` mode. All derived methods
    (`randrange`, `shuffle`, ...) route through `getrandbits`, which reads
    the keystream; nothing falls back to the Mersenne Twister.
    """

    def seed(self, a=None, version=2):  # noqa: D102 - random.Random hook
        from ..crypto.transcript import ChaCha20Words

        if a is None:
            key = secrets.token_bytes(32)
        elif isinstance(a, int):
            n = max(1, (abs(a).bit_length() + 7) // 8) + (1 if a < 0 else 0)
            key = hashlib.blake2s(a.to_bytes(n, "little", signed=a < 0)).digest()
        elif isinstance(a, (bytes, bytearray)):
            key = hashlib.blake2s(bytes(a)).digest()
        else:
            key = hashlib.blake2s(repr(a).encode()).digest()
        self._stream = ChaCha20Words(key)
        self._buf = b""

    def _take(self, nbytes: int) -> bytes:
        while len(self._buf) < nbytes:
            self._buf += self._stream.keystream(max(nbytes, 256))
        out, self._buf = self._buf[:nbytes], self._buf[nbytes:]
        return out

    def getrandbits(self, k: int) -> int:
        if k <= 0:
            return 0
        nbytes = (k + 7) // 8
        return int.from_bytes(self._take(nbytes), "little") >> (8 * nbytes - k)

    def random(self) -> float:
        return self.getrandbits(53) * (2.0 ** -53)

    def getstate(self):  # pragma: no cover - not used by the framework
        raise NotImplementedError("ChaChaRandom state export is unsupported")

    def setstate(self, state):  # pragma: no cover
        raise NotImplementedError("ChaChaRandom state import is unsupported")


class GameRng:
    """Protocol randomness source.

    `GameRng()` (no seed) is the secure default: OS CSPRNG, non-deterministic,
    the equivalent of the reference's `thread_rng()`. `GameRng(seed)` is the
    reproducible test/bench mode (ChaCha20-keyed, see module doc).
    """

    def __init__(self, seed: int | None = None):
        self.seeded = seed is not None
        self.rng: random.Random = (
            ChaChaRandom(seed) if self.seeded else random.SystemRandom()
        )

    def scalar(self, order: int) -> int:
        return self.rng.randrange(order)

    def scalars(self, order: int, *shape: int) -> np.ndarray:
        """Object array of python ints with the given shape."""
        n = int(np.prod(shape)) if shape else 1
        vals = [self.rng.randrange(order) for _ in range(n)]
        arr = np.empty(n, dtype=object)
        arr[:] = vals
        return arr.reshape(shape) if shape else arr[0]

    def permutation(self, size: int) -> np.ndarray:
        """Uniform permutation (Fisher-Yates, as proof-essentials'
        `Permutation::new`). Returned as an int array `pi` with semantics
        output[i] = input[pi[i]]."""
        idx = list(range(size))
        self.rng.shuffle(idx)
        return np.array(idx, dtype=np.int32)

    def bytes(self, n: int) -> bytes:
        if self.seeded:
            return bytes(self.rng.getrandbits(8) for _ in range(n))
        return secrets.token_bytes(n)

    def scalar_limbs(self, order: int, shape, L: int) -> np.ndarray:
        """Uniform scalars in [0, order) directly as uint32[shape..., L]
        16-bit limbs — vectorized sampling with rejection, ~1000x faster
        than per-int Python draws for proof-batch randomness (the host-side
        cost at B=256 decks is otherwise seconds per batch).

        Default mode draws limbs straight from the OS CSPRNG (`os.urandom`)
        so bulk blinding factors stay cryptographically unpredictable; the
        seeded mode uses a PCG64 stream keyed from this GameRng's ChaCha
        stream, reproducible under a fixed seed (tests/benches only).
        """
        shape = tuple(shape)
        n = int(np.prod(shape)) if shape else 1
        bits = order.bit_length()
        top = -(-bits // 16) - 1  # index of the highest possibly-set limb
        top_mask = (1 << (bits - 16 * top)) - 1
        # order as limbs, most-significant first for lexicographic compare
        olimbs = np.array(
            [(order >> (16 * i)) & 0xFFFF for i in range(L - 1, -1, -1)],
            dtype=np.uint32,
        )
        if self.seeded:
            npr = np.random.Generator(np.random.PCG64(self.rng.getrandbits(64)))

            def draw16(rows: int) -> np.ndarray:
                return npr.integers(0, 1 << 16, (rows, L), dtype=np.uint32)
        else:

            def draw16(rows: int) -> np.ndarray:
                raw = np.frombuffer(os.urandom(rows * L * 2), dtype=np.uint16)
                return raw.astype(np.uint32).reshape(rows, L)

        out = np.zeros((n, L), np.uint32)
        pending = np.arange(n)
        while pending.size:
            draw = draw16(pending.size)
            draw[:, top + 1:] = 0
            draw[:, top] &= top_mask
            # accept iff value < order (big-endian lexicographic)
            be = draw[:, ::-1]
            lt = np.zeros(pending.size, bool)
            decided = np.zeros(pending.size, bool)
            for i in range(L):
                lo = ~decided & (be[:, i] < olimbs[i])
                hi = ~decided & (be[:, i] > olimbs[i])
                lt |= lo
                decided |= lo | hi
            ok = lt  # equal-to-order (undecided) rejects too
            out[pending[ok]] = draw[ok]
            pending = pending[~ok]
        return out.reshape(shape + (L,))


def ints_to_limbs(vals, L: int) -> np.ndarray:
    """Nested list / object-array of python ints -> uint32[..., L] canonical."""
    arr = np.asarray(vals, dtype=object)
    flat = [int_to_limbs(int(v), L) for v in arr.reshape(-1)]
    return np.stack(flat).reshape(arr.shape + (L,)).astype(np.uint32)
