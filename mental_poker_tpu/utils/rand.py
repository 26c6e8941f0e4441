"""Host randomness utilities (role of `ark_std::rand` + proof-essentials
`utils::rand::sample_vector` / `utils::permutation::Permutation` in the
reference — use-sites `tests.rs:11,187-190`, `lib.rs:8,187`).

A `GameRng` wraps a seeded Python `random.Random`; all protocol sampling
(secret keys, masking factors, permutations, blinding values) flows through it
so games are reproducible under a fixed seed.
"""

from __future__ import annotations

import random

import numpy as np

from ..ops.field import int_to_limbs


class GameRng:
    def __init__(self, seed: int | None = None):
        self.rng = random.Random(seed if seed is not None else random.SystemRandom().randrange(2**64))

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
        return bytes(self.rng.getrandbits(8) for _ in range(n))

    def scalar_limbs(self, order: int, shape, L: int) -> np.ndarray:
        """Uniform scalars in [0, order) directly as uint32[shape..., L]
        16-bit limbs — vectorized numpy sampling with rejection, ~1000x
        faster than per-int Python draws for proof-batch randomness
        (the host-side cost at B=256 decks is otherwise seconds per batch).

        Seeded from this GameRng (one 64-bit draw), so games stay
        reproducible under a fixed seed.
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
        npr = np.random.Generator(np.random.PCG64(self.rng.getrandbits(64)))
        out = np.zeros((n, L), np.uint32)
        pending = np.arange(n)
        while pending.size:
            draw = npr.integers(0, 1 << 16, (pending.size, L), dtype=np.uint32)
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
