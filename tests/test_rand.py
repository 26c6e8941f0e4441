"""Host randomness utilities (reference role: `ark_std::rand` /
`utils::rand::sample_vector`, `utils::permutation::Permutation`)."""

import numpy as np

from mental_poker_tpu.ops.field import STARK_R, limbs_to_int
from mental_poker_tpu.utils.rand import GameRng


def test_scalar_limbs_range_uniqueness_determinism():
    rng = GameRng(7)
    out = rng.scalar_limbs(STARK_R, (500,), 16)
    vals = [limbs_to_int(r) for r in out]
    assert all(0 <= v < STARK_R for v in vals)
    assert len(set(vals)) == 500
    out2 = GameRng(7).scalar_limbs(STARK_R, (500,), 16)
    assert (out == out2).all()
    mean_frac = np.mean([v / STARK_R for v in vals])
    assert 0.4 < mean_frac < 0.6


def test_permutation_is_uniform_shape():
    rng = GameRng(3)
    pi = rng.permutation(52)
    assert sorted(pi.tolist()) == list(range(52))


def test_default_rng_is_csprng_and_nondeterministic():
    """The default (unseeded) GameRng must match the reference's thread_rng()
    security model (`tests.rs:51`, `round.rs:233`): OS-CSPRNG-backed, never a
    Mersenne Twister, and non-deterministic across instances."""
    import random

    a, b = GameRng(), GameRng()
    assert not a.seeded
    # SystemRandom: OS entropy, no recoverable generator state
    assert isinstance(a.rng, random.SystemRandom)
    assert a.scalar(STARK_R) != b.scalar(STARK_R)
    assert (a.scalar_limbs(STARK_R, (8,), 16) != b.scalar_limbs(STARK_R, (8,), 16)).any()
    assert a.bytes(32) != b.bytes(32)
    assert (a.permutation(52) != b.permutation(52)).any()


def test_seeded_rng_is_chacha_not_mersenne():
    """Seeded (reproducible) mode rides a ChaCha20 keystream; nothing in the
    framework instantiates the stdlib Mersenne Twister."""
    import random

    from mental_poker_tpu.utils.rand import ChaChaRandom

    r = GameRng(9)
    assert isinstance(r.rng, ChaChaRandom)
    assert type(r.rng) is not random.Random
    # the stream is reproducible and distinct across seeds
    assert GameRng(9).scalar(STARK_R) == GameRng(9).scalar(STARK_R)
    assert GameRng(9).scalar(STARK_R) != GameRng(10).scalar(STARK_R)
