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

    # ------------------------------------------------------------- building
    def identity(self, batch_shape=()) -> PointP:
        f = self.fq
        return PointP(f.zeros(batch_shape), f.ones(batch_shape), f.zeros(batch_shape))

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
        """Complete projective addition (RCB15 Algorithm 1; any `a`)."""
        f = self.fq
        mul, add, sub = f.mont_mul, f.add, f.sub
        a = jnp.asarray(self.a_mont)
        b3 = jnp.asarray(self.b3_mont)
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t2 = mul(Z1, Z2)
        t3 = add(X1, Y1)
        t4 = add(X2, Y2)
        t3 = mul(t3, t4)
        t4 = add(t0, t1)
        t3 = sub(t3, t4)
        t4 = add(X1, Z1)
        t5 = add(X2, Z2)
        t4 = mul(t4, t5)
        t5 = add(t0, t2)
        t4 = sub(t4, t5)
        t5 = add(Y1, Z1)
        X3 = add(Y2, Z2)
        t5 = mul(t5, X3)
        X3 = add(t1, t2)
        t5 = sub(t5, X3)
        Z3 = mul(a, t4)
        X3 = mul(b3, t2)
        Z3 = add(X3, Z3)
        X3 = sub(t1, Z3)
        Z3 = add(t1, Z3)
        Y3 = mul(X3, Z3)
        t1 = add(t0, t0)
        t1 = add(t1, t0)
        t2 = mul(a, t2)
        t4 = mul(b3, t4)
        t1 = add(t1, t2)
        t2 = sub(t0, t2)
        t2 = mul(a, t2)
        t4 = add(t4, t2)
        t0 = mul(t1, t4)
        Y3 = add(Y3, t0)
        t0 = mul(t5, t4)
        X3 = mul(X3, t3)
        X3 = sub(X3, t0)
        t0 = mul(t3, t1)
        Z3 = mul(t5, Z3)
        Z3 = add(Z3, t0)
        return PointP(X3, Y3, Z3)

    def dbl(self, P: PointP) -> PointP:
        """Complete projective doubling (RCB15 Algorithm 3; any `a`)."""
        f = self.fq
        mul, add, sub = f.mont_mul, f.add, f.sub
        a = jnp.asarray(self.a_mont)
        b3 = jnp.asarray(self.b3_mont)
        X, Y, Z = P
        t0 = mul(X, X)
        t1 = mul(Y, Y)
        t2 = mul(Z, Z)
        t3 = mul(X, Y)
        t3 = add(t3, t3)
        Z3 = mul(X, Z)
        Z3 = add(Z3, Z3)
        X3 = mul(a, Z3)
        Y3 = mul(b3, t2)
        Y3 = add(X3, Y3)
        X3 = sub(t1, Y3)
        Y3 = add(t1, Y3)
        Y3 = mul(X3, Y3)
        X3 = mul(t3, X3)
        Z3 = mul(b3, Z3)
        t2 = mul(a, t2)
        t3 = sub(t0, t2)
        t3 = mul(a, t3)
        t3 = add(t3, Z3)
        Z3 = add(t0, t0)
        t0 = add(Z3, t0)
        t0 = add(t0, t2)
        t0 = mul(t0, t3)
        Y3 = add(Y3, t0)
        t2 = mul(Y, Z)
        t2 = add(t2, t2)
        t0 = mul(t2, t3)
        X3 = sub(X3, t0)
        Z3 = mul(t2, t1)
        Z3 = add(Z3, Z3)
        Z3 = add(Z3, Z3)
        return PointP(X3, Y3, Z3)

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

    def scalar_mul(self, k, P: PointP) -> PointP:
        """k * P; `k` = canonical (non-Montgomery) scalar limbs [..., L]
        broadcastable against P's batch shape."""
        bits = self.scalar_bits(k)

        def body(acc, bit):
            acc = self.dbl(acc)
            acc2 = self.add(acc, P)
            return self.select(bit != 0, acc2, acc), None

        batch = jnp.broadcast_shapes(k.shape[:-1], P.x.shape[:-1])
        Pb = PointP(
            jnp.broadcast_to(P.x, batch + P.x.shape[-1:]),
            jnp.broadcast_to(P.y, batch + P.y.shape[-1:]),
            jnp.broadcast_to(P.z, batch + P.z.shape[-1:]),
        )
        P = Pb
        acc, _ = jax.lax.scan(body, self.identity(batch), bits)
        return acc

    def sum_points(self, P: PointP, axis: int = 0) -> PointP:
        """EC sum reduction along a batch axis (log-depth tree)."""
        x, y, z = P
        if axis != 0:
            x = jnp.moveaxis(x, axis, 0)
            y = jnp.moveaxis(y, axis, 0)
            z = jnp.moveaxis(z, axis, 0)
        n = x.shape[0]
        Pt = PointP(x, y, z)
        while n > 1:
            half = n // 2
            even = PointP(Pt.x[: 2 * half : 2], Pt.y[: 2 * half : 2], Pt.z[: 2 * half : 2])
            odd = PointP(Pt.x[1 : 2 * half : 2], Pt.y[1 : 2 * half : 2], Pt.z[1 : 2 * half : 2])
            s = self.add(even, odd)
            if n % 2:
                s = PointP(
                    jnp.concatenate([s.x, Pt.x[-1:]], 0),
                    jnp.concatenate([s.y, Pt.y[-1:]], 0),
                    jnp.concatenate([s.z, Pt.z[-1:]], 0),
                )
            Pt = s
            n = Pt.x.shape[0]
        return PointP(Pt.x[0], Pt.y[0], Pt.z[0])

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
