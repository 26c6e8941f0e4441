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


def ints_to_limbs(vals, L: int) -> np.ndarray:
    """Nested list / object-array of python ints -> uint32[..., L] canonical."""
    arr = np.asarray(vals, dtype=object)
    flat = [int_to_limbs(int(v), L) for v in arr.reshape(-1)]
    return np.stack(flat).reshape(arr.shape + (L,)).astype(np.uint32)
