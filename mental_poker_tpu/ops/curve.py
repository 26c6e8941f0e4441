"""Short-Weierstrass curve arithmetic on TPU (L1b of the stack).

Fills the role of `ark-ec`'s `ProjectiveCurve`/`AffineCurve` in the reference's
dependency closure (use-sites `src/discrete_log_cards/mod.rs:7,197,308`).

Design: points are homogeneous projective (X:Y:Z) triples of Montgomery-form
limb arrays, combined with the Renes-Costello-Batina (2015) **complete**
addition formulas (Algorithms 1 and 3, valid for any short-Weierstrass `a`).
Complete formulas are the TPU-native choice: a single branch-free code path
covers add/double/identity, so the same compiled kernel serves every lane of a
vmapped batch — no data-dependent control flow, no divergence.

The point at infinity is (0:1:0); `Z == 0` identifies it.

Scalar multiplication is an MSB-first double-and-add ladder expressed as
`lax.scan` over bit-planes (compile-friendly: the ~26-field-mul body is traced
once). Fixed-base windowed tables and MSM live in `ops/msm.py`.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as field_mod
from .field import Field, LIMB_BITS
from ..utils import host_curve


class PointP(NamedTuple):
    """Projective point; each coord is uint32[..., L] Montgomery limbs."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def _use_pallas() -> bool:
    """Trace-time switch: fused Pallas point kernels on TPU backends
    (single source of truth: ops/pallas/field.use_pallas; MPTPU_PALLAS
    overrides). Checked at trace time, so each backend's compiled programs
    pick the right path automatically."""
    from .pallas import field as pallas_field

    return pallas_field.use_pallas()


class Curve:
    def __init__(self, host: host_curve.HostCurve, fq: Field, fr: Field):
        self.host = host
        self.fq = fq
        self.fr = fr
        self.name = host.name
        self.a_int = host.a % host.p
        self.a_mont = fq.from_int(host.a)
        self.b3_mont = fq.from_int(3 * host.b)
        self.a_is_zero = self.a_int == 0
        self.gen_affine = (fq.from_int(host.gx), fq.from_int(host.gy))
        self.b_mont = fq.from_int(host.b)
        # Jit every public device entry point (see Field.__init__). Compile
        # time per program/shape is the dominant cost (10-40s on both CPU and
        # TPU backends), so the heavyweight entries (scalar_mul, to_affine)
        # additionally canonicalize their batch shape — flatten + pad to the
        # next power of two — to maximize compile-cache reuse across callers.
        self.add = jax.jit(self.add)
        self.dbl = jax.jit(self.dbl)
        self.neg = jax.jit(self.neg)
        self.select = jax.jit(self.select)
        self.eq = jax.jit(self.eq)
        self.on_curve = jax.jit(self.on_curve)
        self._to_affine_jit = jax.jit(self.to_affine)
        self.to_affine = self._to_affine_canon
        self._scalar_mul_jit = jax.jit(self.scalar_mul, static_argnames=("c",))
        self.scalar_mul = self._scalar_mul_canon
        self.sum_points = jax.jit(self.sum_points, static_argnames=("axis", "chunk"))

    @staticmethod
    def _pow2(n: int) -> int:
        return 1 if n <= 1 else 1 << (n - 1).bit_length()

    def _scalar_mul_canon(self, k, P: PointP, c: int = 4) -> PointP:
        """scalar_mul with canonical [B_pow2, L] batch shape (see __init__)."""
        kL = k.shape[-1]
        fL = P.x.shape[-1]
        batch = jnp.broadcast_shapes(k.shape[:-1], P.x.shape[:-1])
        B = int(np.prod(batch)) if batch else 1
        Bp = self._pow2(B)
        k = jnp.broadcast_to(k, batch + (kL,)).reshape(B, kL)
        P = PointP(*(jnp.broadcast_to(q, batch + (fL,)).reshape(B, fL) for q in P))
        if Bp != B:
            k = jnp.concatenate([k, jnp.zeros((Bp - B, kL), k.dtype)], 0)
            P = PointP(*(jnp.concatenate([q, jnp.zeros((Bp - B, fL), q.dtype)], 0) for q in P))
        out = self._scalar_mul_jit(k, P, c=c)
        return PointP(*(q[:B].reshape(batch + (fL,)) for q in out))

    def _to_affine_canon(self, P: PointP):
        fL = P.x.shape[-1]
        batch = P.x.shape[:-1]
        B = int(np.prod(batch)) if batch else 1
        Bp = self._pow2(B)
        Pf = PointP(*(q.reshape(B, fL) for q in P))
        if Bp != B:
            Pf = PointP(*(jnp.concatenate([q, jnp.zeros((Bp - B, fL), q.dtype)], 0) for q in Pf))
        x, y, inf = self._to_affine_jit(Pf)
        return (
            x[:B].reshape(batch + (fL,)),
            y[:B].reshape(batch + (fL,)),
            inf[:B].reshape(batch),
        )

    # ------------------------------------------------------------- building
    def identity(self, batch_shape=()) -> PointP:
        f = self.fq
        return PointP(f.zeros(batch_shape), f.ones(batch_shape), f.zeros(batch_shape))

    def identity_like(self, ref_x) -> PointP:
        """Identity point with batch shape `ref_x.shape[:-1]`, *derived from*
        `ref_x` (uint32[..., L] limbs) so it inherits its shard_map
        varying-axes type (vma). A constant `identity()` used as a `lax.scan`
        carry mismatches a body output that varies over mesh axes; xor/or on
        the operand keeps the dependency while XLA folds it to a constant.
        """
        z = ref_x ^ ref_x
        one = jnp.asarray(self.fq.one_mont).astype(ref_x.dtype)
        return PointP(z, z | one, z)

    def generator(self, batch_shape=()) -> PointP:
        f = self.fq
        gx = jnp.broadcast_to(jnp.asarray(self.gen_affine[0]), batch_shape + (f.L,))
        gy = jnp.broadcast_to(jnp.asarray(self.gen_affine[1]), batch_shape + (f.L,))
        return PointP(gx, gy, f.ones(batch_shape))

    def from_affine(self, x, y, inf=None) -> PointP:
        """Affine Montgomery-limb coords -> projective. `inf`: bool[...]."""
        f = self.fq
        one = jnp.broadcast_to(jnp.asarray(f.one_mont), x.shape)
        zero = jnp.zeros_like(x)
        if inf is None:
            return PointP(x, y, one)
        infc = inf[..., None]
        return PointP(
            jnp.where(infc, zero, x),
            jnp.where(infc, one, y),
            jnp.where(infc, zero, one),
        )

    def from_host_points(self, pts) -> PointP:
        """List of host (x, y, inf) triples -> batched projective point."""
        f = self.fq
        xs = np.stack([f.from_int(0 if P[2] else P[0]) for P in pts])
        ys = np.stack([f.from_int(1 if P[2] else P[1]) for P in pts])
        inf = np.array([bool(P[2]) for P in pts])
        return self.from_affine(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(inf))

    def to_host_points(self, P: PointP) -> list:
        """Batched projective point -> list of host (x, y, inf) triples."""
        x, y, inf = jax.device_get(self.to_affine(P))
        f = self.fq
        L = f.L
        xs = np.asarray(x).reshape(-1, L)
        ys = np.asarray(y).reshape(-1, L)
        infs = np.asarray(inf).reshape(-1)
        out = []
        for xi, yi, ii in zip(xs, ys, infs):
            if ii:
                out.append(self.host.identity)
            else:
                out.append((f.to_int(xi), f.to_int(yi), False))
        return out

    # ------------------------------------------------------------- core ops
    def is_identity(self, P: PointP):
        return self.fq.is_zero(P.z)

    def neg(self, P: PointP) -> PointP:
        return PointP(P.x, self.fq.neg(P.y), P.z)

    def add(self, P: PointP, Q: PointP) -> PointP:
        """Complete projective addition (RCB15 Algorithm 1; any `a`).

        On TPU backends this dispatches to the fused Pallas kernel
        (ops/pallas/curve.py): the whole 12-mul formula runs VMEM-resident in
        one program. Elsewhere (CPU CI, interpret-free environments) it uses
        the *layered* jnp formulation: the 12 multiplications and ~17
        additions regrouped by dependency depth into 3 batched `mont_mul`
        calls and ~7 batched add/sub calls over operands stacked on a new
        leading axis (traced graph ~4x smaller, wider VPU ops). Both paths
        are bit-identical (mod-p ops are exact; outputs canonically reduced).
        """
        if _use_pallas():
            from .pallas import curve as pallas_curve

            return pallas_curve.point_add(self, P, Q)
        f = self.fq
        X1, Y1, Z1 = jnp.broadcast_arrays(*P)
        X2, Y2, Z2 = jnp.broadcast_arrays(*Q)
        X1, X2 = jnp.broadcast_arrays(X1, X2)
        Y1, Y2 = jnp.broadcast_arrays(Y1, Y2)
        Z1, Z2 = jnp.broadcast_arrays(Z1, Z2)
        bshape = X1.shape
        a = jnp.broadcast_to(jnp.asarray(self.a_mont), bshape)
        b3 = jnp.broadcast_to(jnp.asarray(self.b3_mont), bshape)

        st = lambda *xs: jnp.stack(xs, axis=0)
        # layer A: cross-sums, then the 6 independent products
        sums = f.add(st(X1, X2, X1, X2, Y1, Y2), st(Y1, Y2, Z1, Z2, Z1, Z2))
        prods = f.mont_mul(
            st(X1, Y1, Z1, sums[0], sums[2], sums[4]),
            st(X2, Y2, Z2, sums[1], sums[3], sums[5]),
        )
        t0, t1, t2, p3, p4, p5 = (prods[i] for i in range(6))
        ss = f.add(st(t0, t0, t1), st(t1, t2, t2))  # t0+t1, t0+t2, t1+t2
        d = f.sub(st(p3, p4, p5, t0), st(ss[0], ss[1], ss[2], t2))
        t3, t4, t5, t0mt2 = (d[i] for i in range(4))
        # layer B: products against the curve constants
        u = f.mont_mul(st(a, b3, a, b3, a), st(t4, t2, t2, t4, t0mt2))
        u0, u1, u2, u3, u4 = (u[i] for i in range(5))
        cA = f.add(st(u1, t0, u3), st(u0, t0, u4))  # Z3', 2t0, t4b
        Z3p, t0x2, t4b = cA[0], cA[1], cA[2]
        cB = f.add(st(t0x2, t1), st(t0, Z3p))  # 3t0, Z3a
        t1b = f.add(cB[0], u2)
        X3a = f.sub(t1, Z3p)
        Z3a = cB[1]
        # layer C: final products and combinations
        v = f.mont_mul(st(X3a, t1b, t5, X3a, t3, t5), st(Z3a, t4b, t4b, t3, t1b, Z3a))
        fin = f.add(st(v[0], v[5]), st(v[1], v[4]))  # Y3, Z3
        X3 = f.sub(v[3], v[2])
        return PointP(X3, fin[0], fin[1])

    def dbl(self, P: PointP) -> PointP:
        """Complete doubling = add(P, P) (the complete formulas cover it);
        reuses the layered-add compiled program instead of a second one."""
        return self.add(P, P)

    def select(self, cond, P: PointP, Q: PointP) -> PointP:
        """cond[... batch] ? P : Q, elementwise."""
        c = cond[..., None]
        return PointP(
            jnp.where(c, P.x, Q.x), jnp.where(c, P.y, Q.y), jnp.where(c, P.z, Q.z)
        )

    def eq(self, P: PointP, Q: PointP):
        """Projective equality (cross-multiplied), identity-aware."""
        f = self.fq
        x_eq = f.eq(f.mont_mul(P.x, Q.z), f.mont_mul(Q.x, P.z))
        y_eq = f.eq(f.mont_mul(P.y, Q.z), f.mont_mul(Q.y, P.z))
        pi, qi = self.is_identity(P), self.is_identity(Q)
        both_inf = pi & qi
        neither = (~pi) & (~qi)
        return both_inf | (neither & x_eq & y_eq)

    def on_curve(self, P: PointP):
        """Y^2 Z == X^3 + a X Z^2 + b Z^3 (projective curve equation)."""
        f = self.fq
        b_mont = f.from_int(self.host.b)
        lhs = f.mont_mul(f.mont_mul(P.y, P.y), P.z)
        z2 = f.mont_mul(P.z, P.z)
        rhs = f.mont_mul(f.mont_mul(P.x, P.x), P.x)
        rhs = f.add(rhs, f.mont_mul(jnp.asarray(self.a_mont), f.mont_mul(P.x, z2)))
        rhs = f.add(rhs, f.mont_mul(jnp.asarray(b_mont), f.mont_mul(z2, P.z)))
        return f.eq(lhs, rhs)

    # --------------------------------------------------------- scalar muls
    def scalar_bits(self, k, nbits: int | None = None):
        """Canonical-form scalar limbs [..., L] -> bits [nbits, ...] MSB-first."""
        nbits = nbits or self.fr.bits
        planes = []
        for t in range(nbits - 1, -1, -1):
            planes.append((k[..., t // LIMB_BITS] >> (t % LIMB_BITS)) & 1)
        return jnp.stack(planes, axis=0)

    def scalar_mul(self, k, P: PointP, c: int = 4) -> PointP:
        """k * P; `k` = canonical (non-Montgomery) scalar limbs [..., L]
        broadcastable against P's batch shape.

        Windowed (c-bit) double-and-add: a per-point multiples table
        (2^c - 2 adds, branch-free thanks to complete formulas — entry 0 is
        the identity and adds through the same code path), then a scan over
        W = ceil(bits/c) windows of (c doublings + 1 gather + 1 add) —
        ~4x fewer point additions than a bit ladder.
        """
        batch = jnp.broadcast_shapes(k.shape[:-1], P.x.shape[:-1])
        fL = P.x.shape[-1]
        P = PointP(
            jnp.broadcast_to(P.x, batch + (fL,)),
            jnp.broadcast_to(P.y, batch + (fL,)),
            jnp.broadcast_to(P.z, batch + (fL,)),
        )
        k = jnp.broadcast_to(k, batch + (k.shape[-1],))
        table = self.multiples_table(P, c)  # [..., 2^c, L]

        nbits = self.fr.bits
        W = -(-nbits // c)
        per_limb = LIMB_BITS // c
        digits = jnp.stack(
            [
                (k[..., w // per_limb] >> ((w % per_limb) * c)) & ((1 << c) - 1)
                for w in range(W - 1, -1, -1)
            ],
            axis=0,
        )  # [W, ...] MSB window first

        def dbl_body(i, acc):
            return self.dbl(acc)

        def body(acc, dig):
            acc = jax.lax.fori_loop(0, c, dbl_body, acc)
            ix = dig[..., None, None]
            ent = PointP(
                *(
                    jnp.take_along_axis(
                        coord, jnp.broadcast_to(ix, dig.shape + (1, fL)), axis=-2
                    )[..., 0, :]
                    for coord in table
                )
            )
            return self.add(acc, ent), None

        acc, _ = jax.lax.scan(body, self.identity_like(P.x), digits)
        return acc

    def multiples_table(self, P: PointP, c: int) -> PointP:
        """[identity, P, 2P, ..., (2^c - 1)P] stacked on axis -2, built with a
        scan so point-add is traced ONCE (keeps compile time flat)."""
        def body(acc, _):
            nxt = self.add(acc, P)
            return nxt, nxt

        _, rest = jax.lax.scan(
            body, self.identity_like(P.x), None, length=(1 << c) - 1
        )
        # rest coords: [2^c - 1, ..., L]; prepend identity and move to axis -2
        ident = self.identity_like(P.x)
        table = PointP(
            *(
                jnp.moveaxis(jnp.concatenate([i0[None], r], axis=0), 0, -2)
                for i0, r in zip(ident, rest)
            )
        )
        return table

    def sum_points(self, P: PointP, axis: int = 0, chunk: int = 0) -> PointP:
        """EC sum reduction along a batch axis.

        Two-stage, trace-minimal scheme (the traced point-add graph is ~1.2k
        ops, so COMPILE time scales with how many adds get traced, while
        RUN time scales with sequential depth):

        1. scan-accumulate rows of width `chunk` (ONE traced add; depth
           ceil(n/chunk));
        2. halve the final chunk with a shape-stable `lax.scan` — each step
           adds the two halves and pads back with the identity, so log2(chunk)
           steps reuse ONE traced add.

        Identity padding is exact under the complete formulas. Total traced
        adds: 2 (vs log2(n) for an unrolled tree, vs n/8 runtime depth for
        round 1's chunk-scan).
        """
        x, y, z = P
        if axis != 0:
            x = jnp.moveaxis(x, axis, 0)
            y = jnp.moveaxis(y, axis, 0)
            z = jnp.moveaxis(z, axis, 0)
        n = x.shape[0]
        if chunk == 0:
            # adaptive: balance scan depth (n/C) against halving-stage waste
            # (C/2 * log2(C) padded lanes) — C ~ sqrt(2n) is near-optimal
            chunk = 1 << max(4, int(np.ceil(np.log2(max(2 * n, 1) ** 0.5))))
        C = 1 if n <= 1 else min(1 << (n - 1).bit_length(), chunk)
        G = -(-n // C)
        if G * C != n:
            padn = G * C - n
            ident = self.identity_like(x[:1])  # derived: keeps vma (see above)
            x = jnp.concatenate([x, jnp.broadcast_to(ident.x, (padn,) + x.shape[1:])], 0)
            y = jnp.concatenate([y, jnp.broadcast_to(ident.y, (padn,) + y.shape[1:])], 0)
            z = jnp.concatenate([z, jnp.broadcast_to(ident.z, (padn,) + z.shape[1:])], 0)
        rest = x.shape[1:]
        Pt = PointP(
            x.reshape((G, C) + rest), y.reshape((G, C) + rest), z.reshape((G, C) + rest)
        )
        if G > 1:
            def body(acc, row):
                return self.add(acc, PointP(*row)), None

            acc, _ = jax.lax.scan(body, self.identity_like(Pt.x[0]), tuple(Pt))
        else:
            acc = PointP(Pt.x[0], Pt.y[0], Pt.z[0])
        # Shape-stable halving scan: pair adjacent entries (stride 2), pad the
        # tail back to C with the identity. Valid partial sums stay packed at
        # the front and identity pairs stay identity, so log2(C) iterations of
        # ONE traced add reduce the chunk exactly.
        steps = (C - 1).bit_length()  # log2(C)
        if steps:
            h = C // 2

            def halve(acc_t, _):
                acc_p = PointP(*acc_t)
                s = self.add(
                    PointP(acc_p.x[0::2], acc_p.y[0::2], acc_p.z[0::2]),
                    PointP(acc_p.x[1::2], acc_p.y[1::2], acc_p.z[1::2]),
                )
                ident = self.identity_like(s.x)
                out = PointP(
                    jnp.concatenate([s.x, ident.x], 0),
                    jnp.concatenate([s.y, ident.y], 0),
                    jnp.concatenate([s.z, ident.z], 0),
                )
                return tuple(out), None

            acc_t, _ = jax.lax.scan(halve, tuple(acc), None, length=steps)
            acc = PointP(*acc_t)
        return PointP(acc.x[0], acc.y[0], acc.z[0])

    # ------------------------------------------------------------ to affine
    def to_affine(self, P: PointP):
        """-> (x, y, inf) with x,y Montgomery limbs; identity -> (0, 1, True)."""
        f = self.fq
        inf = self.is_identity(P)
        zsafe = f.select(inf, f.ones(P.z.shape[:-1]), P.z)
        if P.z.ndim == 1:
            zinv = f.inv(zsafe)
        else:
            shp = zsafe.shape
            zinv = f.batch_inv(zsafe.reshape(-1, shp[-1])).reshape(shp)
        x = f.mont_mul(P.x, zinv)
        y = f.mont_mul(P.y, zinv)
        x = jnp.where(inf[..., None], jnp.zeros_like(x), x)
        y = jnp.where(inf[..., None], f.ones(y.shape[:-1]), y)
        return x, y, inf


@functools.cache
def stark_curve() -> Curve:
    return Curve(host_curve.STARK, field_mod.stark_fq(), field_mod.stark_fr())


@functools.cache
def bls12_377_g1() -> Curve:
    return Curve(
        host_curve.BLS12_377_G1, field_mod.bls12_377_fq(), field_mod.bls12_377_fr()
    )
