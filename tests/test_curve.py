"""Device curve ops cross-checked against the independent host (bigint) curve."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mental_poker_tpu.ops import curve as C
from mental_poker_tpu.ops.curve import PointP


CURVES = [C.stark_curve(), C.bls12_377_g1()]


@pytest.fixture(scope="module")
def rng():
    return random.Random(777)


def host_rand_points(cv, rng, n):
    return [cv.host.mul(rng.randrange(1, cv.host.order), cv.host.generator) for _ in range(n)]


@pytest.mark.parametrize("cv", CURVES, ids=lambda c: c.name)
def test_affine_roundtrip(cv, rng):
    pts = host_rand_points(cv, rng, 4) + [cv.host.identity]
    P = cv.from_host_points(pts)
    assert cv.to_host_points(P) == pts
    assert bool(jnp.all(jax.jit(cv.on_curve)(P)))


@pytest.mark.parametrize("cv", CURVES, ids=lambda c: c.name)
def test_add_matches_host(cv, rng):
    ps = host_rand_points(cv, rng, 6)
    qs = host_rand_points(cv, rng, 6)
    # Exercise the complete-formula special cases: P+P, P+(-P), P+O, O+Q, O+O.
    ps += [ps[0], ps[1], ps[2], cv.host.identity, cv.host.identity]
    qs += [qs[0], ps[1], cv.host.neg(ps[2]), qs[3], cv.host.identity]
    qs[0] = ps[0]  # doubling through add()
    P = cv.from_host_points(ps)
    Q = cv.from_host_points(qs)
    out = jax.jit(cv.add)(P, Q)
    expect = [cv.host.add(p, q) for p, q in zip(ps, qs)]
    assert cv.to_host_points(out) == expect


@pytest.mark.parametrize("cv", CURVES, ids=lambda c: c.name)
def test_dbl_matches_add(cv, rng):
    pts = host_rand_points(cv, rng, 4) + [cv.host.identity]
    P = cv.from_host_points(pts)
    d = jax.jit(cv.dbl)(P)
    s = jax.jit(cv.add)(P, P)
    assert bool(jnp.all(cv.eq(d, s)))
    expect = [cv.host.add(p, p) for p in pts]
    assert cv.to_host_points(d) == expect


@pytest.mark.parametrize("cv", CURVES, ids=lambda c: c.name)
def test_scalar_mul(cv, rng):
    pts = host_rand_points(cv, rng, 3)
    ks = [rng.randrange(cv.host.order) for _ in range(3)]
    ks[1] = 0
    P = cv.from_host_points(pts)
    from mental_poker_tpu.ops.field import int_to_limbs

    k = jnp.asarray(np.stack([int_to_limbs(x, cv.fr.L) for x in ks]))
    out = jax.jit(cv.scalar_mul)(k, P)
    expect = [cv.host.mul(x, p) for x, p in zip(ks, pts)]
    assert cv.to_host_points(out) == expect


def test_eq_and_identity():
    cv = CURVES[0]
    rng = random.Random(3)
    pts = host_rand_points(cv, rng, 2)
    P = cv.from_host_points([pts[0], pts[1], cv.host.identity])
    Q = cv.from_host_points([pts[0], pts[0], cv.host.identity])
    got = np.asarray(jax.device_get(cv.eq(P, Q)))
    assert got.tolist() == [True, False, True]


def test_sum_points():
    cv = CURVES[0]
    rng = random.Random(4)
    pts = host_rand_points(cv, rng, 7)
    P = cv.from_host_points(pts)
    s = jax.jit(cv.sum_points)(P)
    expect = cv.host.identity
    for p in pts:
        expect = cv.host.add(expect, p)
    assert cv.to_host_points(PointP(s.x[None], s.y[None], s.z[None])) == [expect]
