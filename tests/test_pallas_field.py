"""Bit-exactness of the Pallas mont_mul kernel vs the jnp path and bigints.

Runs the kernel in interpreter mode on the CPU backend (conftest pins tests
to CPU); the compiled TPU path is exercised by bench.py's SOL harness.
"""

import numpy as np
import pytest

from mental_poker_tpu.ops import field as field_mod
from mental_poker_tpu.ops.pallas import field as pfield


def _rand_elems(f, n, rng):
    return np.stack([f.from_int(rng.randrange(f.p)) for _ in range(n)])


@pytest.mark.parametrize("fname", ["stark_fq", "stark_fr", "bls12_377_fq"])
def test_mont_mul_matches_jnp_and_bigint(fname):
    import random

    f = getattr(field_mod, fname)()
    rng = random.Random(42)
    n = 9  # odd size exercises lane padding
    a = _rand_elems(f, n, rng)
    b = _rand_elems(f, n, rng)
    got = np.asarray(pfield.mont_mul(f, a, b, interpret=True))
    want = np.asarray(f.mont_mul(a, b))
    assert got.dtype == np.uint32
    np.testing.assert_array_equal(got, want)
    # independent bigint check (a*b in Montgomery form: a*b*R^-1 mod p)
    for i in range(n):
        ai, bi = f.to_int(a[i]), f.to_int(b[i])
        assert f.to_int(got[i]) == ai * bi % f.p


def test_mont_mul_edge_values():
    f = field_mod.stark_fq()
    specials = [0, 1, f.p - 1, f.r_mod_p, (f.p - 1) // 2]
    a = np.stack([f.from_int(x) for x in specials])
    b = np.stack([f.from_int(y) for y in reversed(specials)])
    got = np.asarray(pfield.mont_mul(f, a, b, interpret=True))
    want = np.asarray(f.mont_mul(a, b))
    np.testing.assert_array_equal(got, want)


def test_mont_mul_batch_shapes():
    import random

    f = field_mod.stark_fq()
    rng = random.Random(7)
    a = _rand_elems(f, 6, rng).reshape(2, 3, f.L)
    b = _rand_elems(f, 3, rng).reshape(1, 3, f.L)  # broadcast over axis 0
    got = np.asarray(pfield.mont_mul(f, a, b, interpret=True))
    want = np.asarray(f.mont_mul(a, b))
    np.testing.assert_array_equal(got, want)
