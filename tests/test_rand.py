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
