"""Fast CI gate for the Pallas lane-MSM kernel (interpret mode, tiny curve).

The production-shape interpret tests (tests/test_pallas_msm.py) are slow-marked
because unrolling the 252-bit windowed MSM into one XLA:CPU program takes ~an
hour to compile on this host. This gate runs the SAME kernel code paths
(ops/pallas/msm.py msm_lanes -> _msm_kernel / _msm_kernel_chunked,
interpret=True) over a toy 21-bit prime-order curve: L=2 limbs, W=6 windows —
first-time XLA:CPU compiles are ~1 min (nc=1) / ~8 min (nc=4), cached
persistently afterwards; every structural feature (multiples tables, masked
digit selects, NC tree-reduce, Horner window fold, lane + chunk padding,
N-chunking combine) is exercised against host-bigint MSMs.

Toy curve: y^2 = x^3 + x + 104 over GF(1048583), group order 1048601 (prime),
found by exhaustive point count; generator (0, 944764).
"""

import functools as ft

import numpy as np
import pytest

import jax.numpy as jnp

from mental_poker_tpu.ops import field as field_mod
from mental_poker_tpu.ops.curve import Curve, PointP
from mental_poker_tpu.ops.pallas import msm as pmsm
from mental_poker_tpu.utils import host_curve
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs

TOY = host_curve.HostCurve(
    name="toy21", p=1048583, a=1, b=104, order=1048601, gx=0, gy=944764
)


@pytest.fixture(scope="module")
def cv():
    return Curve(TOY, field_mod.Field(TOY.p, "toy_fq"), field_mod.Field(TOY.order, "toy_fr"))


def _setup(cv, S, N, seed):
    """Random host points/scalars with planted edge cases when they fit."""
    rng = GameRng(seed)
    q = TOY.order
    host_pts = [[TOY.mul(rng.scalar(q) or 1, TOY.generator) for _ in range(N)] for _ in range(S)]
    ks = [[rng.scalar(q) for _ in range(N)] for _ in range(S)]
    ks[0][0] = 0  # zero scalar
    ks[-1][1] = q - 1  # order-1 scalar
    if S >= 3:
        host_pts[2][2] = TOY.identity  # identity point in the mix
    L = cv.fq.L
    flat = cv.from_host_points([p for row in host_pts for p in row])
    pts = PointP(*(c.reshape(S, N, L) for c in flat))
    k = jnp.asarray(ints_to_limbs(ks, cv.fr.L))
    return host_pts, ks, pts, k


def _check(cv, got, host_pts, ks):
    gx, gy, ginf = cv.to_affine(got)
    for s, (krow, prow) in enumerate(zip(ks, host_pts)):
        P = ft.reduce(TOY.add, [TOY.mul(ki, Pi) for ki, Pi in zip(krow, prow)], TOY.identity)
        if P[2]:
            assert bool(np.asarray(ginf)[s])
        else:
            assert not bool(np.asarray(ginf)[s])
            assert cv.fq.to_int(np.asarray(gx)[s]) == P[0]
            assert cv.fq.to_int(np.asarray(gy)[s]) == P[1]


def test_toy_curve_sanity(cv):
    assert TOY.is_on_curve(TOY.generator)
    assert TOY.mul(TOY.order, TOY.generator)[2]  # order * G = identity


def test_msm_lanes_gate_nc1(cv):
    """One-point-per-step kernel (`_msm_kernel`) vs host bigints."""
    host_pts, ks, pts, k = _setup(cv, 3, 5, seed=4)
    got = pmsm.msm_lanes(cv, pts, k, interpret=True, nc=1)
    _check(cv, got, host_pts, ks)


def test_msm_lanes_gate_chunked(cv):
    """NC-chunked kernel (`_msm_kernel_chunked`), incl. the N % NC pad path
    (N=5, NC=4 -> NB=2 with 3 identity-padded slots)."""
    host_pts, ks, pts, k = _setup(cv, 3, 5, seed=4)
    got = pmsm.msm_lanes(cv, pts, k, interpret=True, nc=4)
    _check(cv, got, host_pts, ks)


def test_msm_lanes_gate_split_n(cv, monkeypatch):
    """MAX_N_PER_CALL split: two nc=1 kernel calls + XLA combine, reusing the
    same compiled program as test_msm_lanes_gate_nc1."""
    monkeypatch.setattr(pmsm, "MAX_N_PER_CALL", 5)
    host_pts, ks, pts, k = _setup(cv, 3, 10, seed=11)
    got = pmsm.msm_lanes(cv, pts, k, interpret=True, nc=1)
    _check(cv, got, host_pts, ks)
