"""Fused Pallas TPU kernel for complete projective point addition.

Role: `Curve.add` (ops/curve.py) is the atom of every scalar-mul/MSM in the
stack — the reference's cost model is m*N curve exponentiations per shuffle
proof (`examples/parameter_selection.rs:3`), each ~300 point additions. The
jnp path lowers each addition to 3 batched `mont_mul` programs + ~7 add/sub
programs with every intermediate round-tripping through HBM; this kernel runs
the full Renes-Costello-Batina complete addition (12 field muls, ~19 adds,
any short-Weierstrass `a`) in ONE VMEM-resident program: HBM traffic is
exactly 6 coordinate arrays in, 3 out.

Layout: limb-major [L, B] (limbs on sublanes, batch on lanes), same as
ops/pallas/field.py; the public wrapper transposes from the framework's
[..., L] convention once per kernel call (vs once per field op).

Bit-exactness vs the jnp path is pinned by tests/test_pallas_curve.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field import _borrow_sub, _carry16, _mont_mul_block

# ---------------------------------------------------------------------------
# field helpers on limb-major [L, B] blocks
# ---------------------------------------------------------------------------


def _cond_sub_p(a, pb):
    d, brw = _borrow_sub(a, pb)
    return jnp.where((brw != 0)[None], a, d)


def _add_mod(a, b, pb, L: int):
    """(a + b) mod p; inputs reduced [L, B]."""
    return _cond_sub_p(_carry16(a + b, L), pb)


def _sub_mod(a, b, pb, L: int):
    """(a - b) mod p; inputs reduced [L, B]."""
    d, brw = _borrow_sub(a, b)
    d2 = _carry16(d + pb, L)
    return jnp.where((brw != 0)[None], d2, d)


def _rcb_add(X1, Y1, Z1, X2, Y2, Z2, am, b3m, pb, npb, L: int, a_is_zero: bool):
    """RCB15 Algorithm 1 (complete, any a) on [L, B] blocks.

    Mirrors the operation schedule of `Curve.add` (ops/curve.py) exactly —
    same muls, same adds — so results are bit-identical to the jnp path.
    """
    mul = lambda u, v: _mont_mul_block(u, v, pb, npb, L)
    add = lambda u, v: _add_mod(u, v, pb, L)
    sub = lambda u, v: _sub_mod(u, v, pb, L)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    t5 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    t0mt2 = sub(t0, t2)

    # constants enter as [L, 1] columns; keep the wide operand first so the
    # conv helpers derive the batch width from it
    u0 = mul(t4, am)
    u1 = mul(t2, b3m)
    u2 = mul(t2, am)
    u3 = mul(t4, b3m)
    u4 = mul(t0mt2, am)
    z3p = add(u1, u0)
    x3a = sub(t1, z3p)
    z3a = add(t1, z3p)
    t1b = add(add(add(t0, t0), t0), u2)  # 3*t0 + a*t2
    t4b = add(u3, u4)

    v0 = mul(x3a, z3a)
    v1 = mul(t1b, t4b)
    v2 = mul(t5, t4b)
    v3 = mul(x3a, t3)
    v4 = mul(t3, t1b)
    v5 = mul(t5, z3a)
    X3 = sub(v3, v2)
    Y3 = add(v0, v1)
    Z3 = add(v5, v4)
    return X3, Y3, Z3


def _add_kernel(p_ref, np_ref, a_ref, b3_ref, x1, y1, z1, x2, y2, z2, ox, oy, oz, *, L):
    X3, Y3, Z3 = _rcb_add(
        x1[:], y1[:], z1[:], x2[:], y2[:], z2[:],
        a_ref[:], b3_ref[:], p_ref[:], np_ref[:], L, a_is_zero=False,
    )
    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3


@functools.cache
def _build_add(L: int, consts_key: bytes, BT: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cols = np.frombuffer(consts_key, dtype=np.uint32).reshape(4, L, 1)
    kernel = functools.partial(_add_kernel, L=L)

    @jax.jit
    def run(x1, y1, z1, x2, y2, z2):  # all [L, B] with B % BT == 0
        B = x1.shape[1]
        grid = (B // BT,)
        spec = pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        shp = jax.ShapeDtypeStruct((L, B), jnp.uint32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp),
            grid=grid,
            in_specs=[cspec] * 4 + [spec] * 6,
            out_specs=(spec, spec, spec),
            interpret=interpret,
        )(*(jnp.asarray(c) for c in cols), x1, y1, z1, x2, y2, z2)

    return run


def _consts_key(cv) -> bytes:
    f = cv.fq
    return (
        np.asarray(f.p_limbs, np.uint32).tobytes()
        + np.asarray(f.nprime_limbs, np.uint32).tobytes()
        + np.asarray(cv.a_mont, np.uint32).tobytes()
        + np.asarray(cv.b3_mont, np.uint32).tobytes()
    )


# ---------------------------------------------------------------------------
# window fold: acc = sum_w 2^(c*w) * S_w entirely in VMEM
# ---------------------------------------------------------------------------


def _fold_kernel(p_ref, np_ref, a_ref, b3_ref, one_ref, sx, sy, sz, ox, oy, oz, *, L, W, c):
    """Horner fold over W window sums, MSB window first: acc = 2^c*acc + S_w.

    The accumulator lives in VMEM across all W*(c+1) point operations — the
    XLA-level scan formulation paid one kernel dispatch + HBM round-trip per
    point op (~1.5 ms each at proof-batch widths; W*(c+1) ~ 315 of them)."""
    BT = sx.shape[-1]
    pb = p_ref[:]
    npb = np_ref[:]
    am = a_ref[:]
    b3m = b3_ref[:]
    onem = one_ref[:]
    zero = jnp.zeros((L, BT), jnp.uint32)
    acc0 = (zero, zero + onem, zero)  # identity (0 : 1 : 0)

    def add(P, Q):
        return _rcb_add(*P, *Q, am, b3m, pb, npb, L, False)

    def body(w, acc):
        for _ in range(c):
            acc = add(acc, acc)  # complete formulas: dbl == add(P, P)
        s = (sx[w], sy[w], sz[w])
        return add(acc, s)

    x, y, z = jax.lax.fori_loop(0, W, body, acc0)
    ox[:] = x
    oy[:] = y
    oz[:] = z


@functools.cache
def _build_fold(L: int, W: int, c: int, consts_key: bytes, one_key: bytes, BT: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cols = np.frombuffer(consts_key, dtype=np.uint32).reshape(4, L, 1)
    one_col = np.frombuffer(one_key, dtype=np.uint32).reshape(L, 1)
    kernel = functools.partial(_fold_kernel, L=L, W=W, c=c)

    @jax.jit
    def run(sx, sy, sz):  # [W, L, B] with B % BT == 0, MSB window first
        B = sx.shape[-1]
        grid = (B // BT,)
        sspec = pl.BlockSpec((W, L, BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        shp = jax.ShapeDtypeStruct((L, B), jnp.uint32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp),
            grid=grid,
            in_specs=[cspec] * 5 + [sspec] * 3,
            out_specs=(ospec, ospec, ospec),
            interpret=interpret,
        )(*(jnp.asarray(x) for x in cols), jnp.asarray(one_col), sx, sy, sz)

    return run


def fold_windows(cv, S, c: int, block_lanes: int = 256, interpret: bool | None = None):
    """acc = sum_w 2^(c*w) * S_w for window sums S: PointP [W, ..., L]
    (window 0 = least significant). Returns PointP [..., L]."""
    from ..curve import PointP

    if interpret is None:
        from .field import available

        interpret = not available()
    L = cv.fq.L
    W = S.x.shape[0]
    batch = S.x.shape[1:-1]
    B = int(np.prod(batch)) if batch else 1
    BT = min(block_lanes, max(128, 1 << (B - 1).bit_length() if B > 1 else 128))
    Bp = -(-B // BT) * BT

    def prep(a):  # [W, ..., L] -> [W, L, Bp], MSB window first
        a2 = jnp.flip(a.reshape(W, B, L), axis=0).transpose(0, 2, 1)
        if Bp != B:
            a2 = jnp.pad(a2, ((0, 0), (0, 0), (0, Bp - B)))
        return a2

    run = _build_fold(
        L, W, c, _consts_key(cv),
        np.asarray(cv.fq.one_mont, np.uint32).tobytes(), BT, bool(interpret),
    )
    ox, oy, oz = run(prep(S.x), prep(S.y), prep(S.z))
    post = lambda o: o[:, :B].T.reshape(batch + (L,))
    return PointP(post(ox), post(oy), post(oz))


def point_add(cv, P, Q, block_lanes: int = 512, interpret: bool | None = None):
    """Fused complete point addition, drop-in for `Curve.add`.

    P, Q: PointP with uint32[..., L] Montgomery coords (broadcastable).
    Returns PointP with the broadcast batch shape. Bit-identical to the jnp
    path (all mod-p ops are exact, outputs canonically reduced).
    """
    from ..curve import PointP

    if interpret is None:
        from .field import available

        interpret = not available()
    L = cv.fq.L
    X1, X2 = jnp.broadcast_arrays(P.x, Q.x)
    Y1, Y2 = jnp.broadcast_arrays(P.y, Q.y)
    Z1, Z2 = jnp.broadcast_arrays(P.z, Q.z)
    batch = X1.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    BT = min(block_lanes, max(128, 1 << (B - 1).bit_length() if B > 1 else 128))
    Bp = -(-B // BT) * BT

    def prep(a):
        a2 = a.reshape(B, L).T
        if Bp != B:
            a2 = jnp.pad(a2, ((0, 0), (0, Bp - B)))
        return a2

    run = _build_add(L, _consts_key(cv), BT, bool(interpret))
    ox, oy, oz = run(prep(X1), prep(Y1), prep(Z1), prep(X2), prep(Y2), prep(Z2))
    post = lambda o: o[:, :B].T.reshape(batch + (L,))
    return PointP(post(ox), post(oy), post(oz))
