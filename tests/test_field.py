"""Property tests for the limb field layer against Python bigints.

This is the vector-based testing the reference lacks (SURVEY §4): limb
arithmetic is validated bit-exactly against arbitrary-precision integers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mental_poker_tpu.ops import field as F


FIELDS = [F.stark_fq(), F.stark_fr(), F.bls12_377_fq(), F.bls12_377_fr()]


def rand_ints(rng, f, n):
    return [rng.randrange(f.p) for _ in range(n)]


@pytest.fixture(scope="module")
def rng():
    import random

    return random.Random(12345)


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_roundtrip(f, rng):
    xs = rand_ints(rng, f, 8) + [0, 1, f.p - 1]
    a = f.from_int_array(xs)
    assert f.to_int_array(a) == [x % f.p for x in xs]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(f, rng):
    xs = rand_ints(rng, f, 16) + [0, 0, 1, f.p - 1]
    ys = rand_ints(rng, f, 16) + [0, f.p - 1, f.p - 1, f.p - 1]
    a, b = f.from_int_array(xs), f.from_int_array(ys)
    add = jax.jit(f.add)(a, b)
    sub = jax.jit(f.sub)(a, b)
    neg = jax.jit(f.neg)(a)
    assert f.to_int_array(add) == [(x + y) % f.p for x, y in zip(xs, ys)]
    assert f.to_int_array(sub) == [(x - y) % f.p for x, y in zip(xs, ys)]
    assert f.to_int_array(neg) == [(-x) % f.p for x in xs]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_mul(f, rng):
    xs = rand_ints(rng, f, 32) + [0, 1, f.p - 1, f.p - 1]
    ys = rand_ints(rng, f, 32) + [f.p - 1, f.p - 1, f.p - 1, 1]
    a, b = f.from_int_array(xs), f.from_int_array(ys)
    out = jax.jit(f.mont_mul)(a, b)
    assert f.to_int_array(out) == [(x * y) % f.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip_device(f, rng):
    xs = rand_ints(rng, f, 4)
    canon = np.stack([F.int_to_limbs(x, f.L) for x in xs])
    mont = jax.jit(f.to_mont)(canon)
    back = jax.jit(f.from_mont)(mont)
    assert [F.limbs_to_int(r) for r in np.asarray(back)] == xs


@pytest.mark.parametrize("f", FIELDS[:2], ids=lambda f: f.name)
def test_pow_inv(f, rng):
    xs = rand_ints(rng, f, 4) + [1, f.p - 1]
    a = f.from_int_array(xs)
    sq = jax.jit(lambda v: f.pow_const(v, 5))(a)
    assert f.to_int_array(sq) == [pow(x, 5, f.p) for x in xs]
    inv = jax.jit(f.inv)(a)
    assert f.to_int_array(inv) == [pow(x, -1, f.p) for x in xs]


@pytest.mark.parametrize("f", FIELDS[:2], ids=lambda f: f.name)
def test_inv_zero_maps_to_zero(f):
    z = f.zeros((1,))
    assert f.to_int_array(jax.jit(f.inv)(z)) == [0]


@pytest.mark.parametrize("f", FIELDS[:1], ids=lambda f: f.name)
def test_batch_inv(f, rng):
    xs = rand_ints(rng, f, 9)
    xs[3] = 0  # zero passes through
    a = f.from_int_array(xs)
    out = jax.jit(f.batch_inv)(a)
    expect = [pow(x, -1, f.p) if x else 0 for x in xs]
    assert f.to_int_array(out) == expect


@pytest.mark.parametrize("f", FIELDS[:1], ids=lambda f: f.name)
def test_broadcasting(f, rng):
    xs = rand_ints(rng, f, 6)
    a = f.from_int_array(xs).reshape(2, 3, f.L)
    b = f.from_int(xs[0])
    out = jax.jit(f.mont_mul)(a, b)
    assert out.shape == (2, 3, f.L)
    flat = [f.to_int(r) for r in np.asarray(out).reshape(-1, f.L)]
    assert flat == [(x * xs[0]) % f.p for x in xs]
