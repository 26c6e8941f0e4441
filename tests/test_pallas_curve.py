"""Fused Pallas point-add kernel vs the jnp path (bit-exact) and host math.

Runs the kernel in interpreter mode on the CPU CI backend; on a real TPU the
same code path compiles (gated by `ops.pallas.field.available`). Kept to ONE
kernel trace: interpreter-mode pallas is compile-heavy, so every case rides
one batch shape.
"""

import numpy as np
import jax.numpy as jnp

from mental_poker_tpu.ops import curve as curve_mod
from mental_poker_tpu.ops.curve import PointP
from mental_poker_tpu.ops.pallas import curve as pc
from mental_poker_tpu.utils.rand import GameRng


def _rand_points(cv, rng, k):
    pts = [cv.host.rand_point(rng.rng) for _ in range(k)]
    return pts, cv.from_host_points(pts)


def _cat(*pts):
    return PointP(
        jnp.concatenate([p.x for p in pts], 0),
        jnp.concatenate([p.y for p in pts], 0),
        jnp.concatenate([p.z for p in pts], 0),
    )


def test_point_add_matches_jnp_and_host():
    """One batch covering: generic adds, P+identity, identity+identity,
    P+(-P) -> identity, and P+P (doubling) — through ONE kernel compile."""
    cv = curve_mod.stark_curve()
    rng = GameRng(42)
    hp, P4 = _rand_points(cv, rng, 4)
    hq, Q4 = _rand_points(cv, rng, 4)
    ident = cv.identity((1,))
    first = PointP(P4.x[:1], P4.y[:1], P4.z[:1])
    negP = cv.neg(first)

    P = _cat(P4, first, ident, first, P4)
    Q = _cat(Q4, ident, ident, negP, P4)

    out_k = pc.point_add(cv, P, Q, interpret=True)
    out_j = cv.add(P, Q)
    for a, b in zip(out_k, out_j):
        assert (np.asarray(a) == np.asarray(b)).all()

    got = cv.to_host_points(out_k)
    want = [cv.host.add(a, b) for a, b in zip(hp, hq)]
    assert got[:4] == want
    assert got[4] == hp[0]  # P + 0 == P
    assert got[5] == cv.host.identity  # 0 + 0 == 0
    assert got[6] == cv.host.identity  # P + (-P) == 0
    assert got[7:] == [cv.host.add(a, a) for a in hp]  # doubling


def test_fold_windows_matches_scan():
    """VMEM-resident Horner window fold == the XLA scan formulation."""
    import jax

    cv = curve_mod.stark_curve()
    rng = GameRng(5)
    W, B, c = 5, 3, 4
    hp = [[cv.host.rand_point(rng.rng) for _ in range(B)] for _ in range(W)]
    S = PointP(*(jnp.stack([q[i] for q in map(cv.from_host_points, hp)], 0)
                 for i in range(3)))
    out = pc.fold_windows(cv, S, c, interpret=True)
    # host reference: sum_w 2^(c*w) * S_w
    want = []
    for b in range(B):
        acc = cv.host.identity
        for w in range(W):
            acc = cv.host.add(acc, cv.host.mul(1 << (c * w), hp[w][b]))
        want.append(acc)
    assert cv.to_host_points(out) == want
