"""Batched sigma protocols: Schnorr identification and Chaum-Pedersen
discrete-log equality (reference dependencies E6/E7,
`proof_essentials::zkp::proofs::{schnorr_identification,
chaum_pedersen_dl_equality}` — use-sites `src/discrete_log_cards/mod.rs:
142-148,159-164,193-209,233-238,261-268,291-297,310-326,338-353`).

Both protocols are proved/verified for whole batches at once: the point work
(commitments, verification equations) runs as vectorized device kernels over
[B] statements; challenge derivation runs on B independent reference-style
Fiat-Shamir transcripts; response arithmetic is tiny host int math.

Transcript schedule (this framework's spec — the reference outsources it to
an unvendored crate):
  Schnorr  : absorb( bytes(g) || bytes(pk) || bytes(t) );        c; s = k + c*sk
             verify: s*g == t + c*pk
  ChaumPed : absorb( bytes(g)||bytes(h)||bytes(a)||bytes(b)||
                     bytes(t_g)||bytes(t_h) );                   c; s = k + c*w
             verify: s*g == t_g + c*a  and  s*h == t_h + c*b
Point bytes use the arkworks `ToBytes` layout (serialize.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.curve import Curve, PointP
from ..utils.rand import GameRng, ints_to_limbs
from .errors import CHAUM_PEDERSEN, SCHNORR, ProofVerificationError
from .group import Base, base_mul, base_point, concat_blobs, host_point_bytes, points_to_bytes
from .transcript import TranscriptBatch


def _flat(P: PointP, batch):
    L = P.x.shape[-1]
    return PointP(P.x.reshape((-1, L)), P.y.reshape((-1, L)), P.z.reshape((-1, L)))


@dataclasses.dataclass
class SchnorrProof:
    """(t, s): t = k*g commitment (host points), s = k + c*sk responses."""

    commit: list  # [B] host points
    response: list  # [B] python ints

    def serialize(self, cv: Curve) -> list[bytes]:
        from . import serialize as ser

        return [
            ser.point_to_bytes_compressed(t, cv.host)
            + ser.scalar_to_bytes(s, cv.host.order.bit_length())
            for t, s in zip(self.commit, self.response)
        ]


def schnorr_prove(
    cv: Curve, gen: Base, pk_hosts: list, sk_ints: list, ts: TranscriptBatch, rng: GameRng
) -> SchnorrProof:
    B = len(sk_ints)
    order = cv.host.order
    ks = [rng.scalar(order) for _ in range(B)]
    t_dev = base_mul(cv, gen, ints_to_limbs(ks, cv.fr.L))
    t_hosts = cv.to_host_points(t_dev)
    g_bytes = points_to_bytes(cv, base_point(cv, gen, ()))
    ts.absorb(
        concat_blobs(
            g_bytes,
            [host_point_bytes(cv, pk) for pk in pk_hosts],
            [host_point_bytes(cv, t) for t in t_hosts],
        )
    )
    cs = ts.sample_field(order)
    ss = [(k + c * sk) % order for k, c, sk in zip(ks, cs, sk_ints)]
    return SchnorrProof(t_hosts, ss)


def schnorr_verify(
    cv: Curve, gen: Base, pk_hosts: list, proof: SchnorrProof, ts: TranscriptBatch
) -> None:
    order = cv.host.order
    g_bytes = points_to_bytes(cv, base_point(cv, gen, ()))
    ts.absorb(
        concat_blobs(
            g_bytes,
            [host_point_bytes(cv, pk) for pk in pk_hosts],
            [host_point_bytes(cv, t) for t in proof.commit],
        )
    )
    cs = ts.sample_field(order)
    L = cv.fr.L
    lhs = base_mul(cv, gen, ints_to_limbs(proof.response, L))
    pk_dev = cv.from_host_points(pk_hosts)
    rhs = cv.add(cv.from_host_points(proof.commit), cv.scalar_mul(ints_to_limbs(cs, L), pk_dev))
    ok = np.asarray(cv.eq(lhs, rhs))
    if not bool(ok.all()):
        raise ProofVerificationError(SCHNORR)


@dataclasses.dataclass
class ChaumPedersenProof:
    """(t_g, t_h, s) per statement; shape-preserving over the batch."""

    t_g: list  # [B] host points
    t_h: list  # [B] host points
    response: list  # [B] python ints
    shape: tuple = ()

    def serialize(self, cv: Curve) -> list[bytes]:
        from . import serialize as ser

        sb = cv.host.order.bit_length()
        return [
            ser.point_to_bytes_compressed(tg, cv.host)
            + ser.point_to_bytes_compressed(th, cv.host)
            + ser.scalar_to_bytes(s, sb)
            for tg, th, s in zip(self.t_g, self.t_h, self.response)
        ]


def cp_prove(
    cv: Curve,
    base_g: Base,
    base_h: Base,
    stmt_a: PointP,
    stmt_b: PointP,
    witnesses: list,
    ts: TranscriptBatch,
    rng: GameRng,
) -> ChaumPedersenProof:
    """Prove a = w*g, b = w*h for each batched statement.

    `stmt_a`/`stmt_b`: batched device points (any batch shape, flattened
    C-order to match `ts` and `witnesses`).
    """
    order = cv.host.order
    shape = stmt_a.x.shape[:-1]
    B = int(np.prod(shape)) if shape else 1
    assert len(witnesses) == B == len(ts)
    ks = [rng.scalar(order) for _ in range(B)]
    k_limbs = ints_to_limbs(ks, cv.fr.L).reshape(shape + (cv.fr.L,))
    t_g = base_mul(cv, base_g, k_limbs)
    t_h = base_mul(cv, base_h, k_limbs)
    gb = points_to_bytes(cv, base_point(cv, base_g, shape))
    hb = points_to_bytes(cv, base_point(cv, base_h, shape))
    ab = points_to_bytes(cv, stmt_a)
    bb = points_to_bytes(cv, stmt_b)
    tgb = points_to_bytes(cv, t_g)
    thb = points_to_bytes(cv, t_h)
    ts.absorb(concat_blobs(gb, hb, ab, bb, tgb, thb))
    cs = ts.sample_field(order)
    ss = [(k + c * w) % order for k, c, w in zip(ks, cs, witnesses)]
    return ChaumPedersenProof(cv.to_host_points(t_g), cv.to_host_points(t_h), ss, shape)


def cp_verify(
    cv: Curve,
    base_g: Base,
    base_h: Base,
    stmt_a: PointP,
    stmt_b: PointP,
    proof: ChaumPedersenProof,
    ts: TranscriptBatch,
) -> None:
    order = cv.host.order
    shape = stmt_a.x.shape[:-1]
    gb = points_to_bytes(cv, base_point(cv, base_g, shape))
    hb = points_to_bytes(cv, base_point(cv, base_h, shape))
    ab = points_to_bytes(cv, stmt_a)
    bb = points_to_bytes(cv, stmt_b)
    tgb = [host_point_bytes(cv, t) for t in proof.t_g]
    thb = [host_point_bytes(cv, t) for t in proof.t_h]
    ts.absorb(concat_blobs(gb, hb, ab, bb, tgb, thb))
    cs = ts.sample_field(order)
    L = cv.fr.L
    s_limbs = ints_to_limbs(proof.response, L).reshape(shape + (L,))
    c_limbs = ints_to_limbs(cs, L).reshape(shape + (L,))

    def unflat(hosts):
        P = cv.from_host_points(hosts)
        return PointP(
            P.x.reshape(shape + (-1,)), P.y.reshape(shape + (-1,)), P.z.reshape(shape + (-1,))
        )

    lhs_g = base_mul(cv, base_g, s_limbs)
    rhs_g = cv.add(unflat(proof.t_g), cv.scalar_mul(c_limbs, stmt_a))
    lhs_h = base_mul(cv, base_h, s_limbs)
    rhs_h = cv.add(unflat(proof.t_h), cv.scalar_mul(c_limbs, stmt_b))
    ok = np.asarray(cv.eq(lhs_g, rhs_g)) & np.asarray(cv.eq(lhs_h, rhs_h))
    if not bool(ok.all()):
        raise ProofVerificationError(CHAUM_PEDERSEN)
