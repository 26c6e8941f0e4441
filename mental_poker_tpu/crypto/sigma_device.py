"""Device-resident sigma protocols: Schnorr identification and Chaum-Pedersen
DL-equality with the Fiat-Shamir transcript fused into the device program.

Mirrors crypto/sigma.py's transcript byte schedule exactly (interop pinned by
tests/test_sigma_device.py): one jitted program proves/verifies a whole
[B]-batch of statements with B independent transcripts and zero host syncs.
Reference roles: E6/E7 of SURVEY §2.2 (`proof_essentials::zkp::proofs`),
use-sites `src/discrete_log_cards/mod.rs:142-164,193-238,310-353`.

Bases come in two shapes:
- fixed (a [W, T, L] window table — the ElGamal generator / aggregate key),
- variable (a batched PointP — e.g. the card's c0 in reveal proofs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.curve import Curve, PointP
from ..ops.msm import fixed_mul
from . import serialize_jax as sj
from . import transcript_jax as dt


class AffPt(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


class SchnorrProofDev(NamedTuple):
    t: AffPt  # [B]
    s: jnp.ndarray  # [B, L] canonical responses


class CPProofDev(NamedTuple):
    t_g: AffPt  # [B]
    t_h: AffPt  # [B]
    s: jnp.ndarray  # [B, L]


def _aff(cv: Curve, P: PointP) -> AffPt:
    x, y, inf = cv.to_affine(P)
    return AffPt(x, y, inf)


def _aff_bytes(cv: Curve, a: AffPt) -> jnp.ndarray:
    f = cv.fq
    xb = sj.field_bytes(f, f.from_mont(a.x))
    yb = sj.field_bytes(f, f.from_mont(a.y))
    return jnp.concatenate([xb, yb, a.inf[..., None].astype(jnp.uint8)], axis=-1)


def _aff_proj(cv: Curve, a: AffPt) -> PointP:
    return cv.from_affine(a.x, a.y, a.inf)


def _mul(cv: Curve, base, k_c):
    """base: [W, T, L] table (fixed) or PointP (variable, batched)."""
    if isinstance(base, PointP) and base.x.ndim == 3:
        return fixed_mul(cv, base, k_c)
    return cv.scalar_mul(k_c, base)


def _base_pt_bytes(cv: Curve, base, batch: tuple) -> jnp.ndarray:
    """Byte blob of the base point, broadcast to the statement batch."""
    if isinstance(base, PointP) and base.x.ndim == 3:
        pt = PointP(base.x[0, 1], base.y[0, 1], base.z[0, 1])
        b = sj.point_bytes(cv, pt)
        return jnp.broadcast_to(b, batch + b.shape)
    return sj.point_bytes(cv, base)


def _resp(cv: Curve, k_c, c_m, w_c):
    """s = k + c*w mod r (inputs canonical k/w, mont challenge)."""
    fr = cv.fr
    return fr.from_mont(
        fr.add(fr.to_mont(k_c), fr.mont_mul(c_m, fr.to_mont(w_c)))
    )


# ---------------------------------------------------------------------------
# Schnorr identification
# ---------------------------------------------------------------------------


def schnorr_prove_dev(
    cv: Curve, st: dt.DTState, gen, pk: PointP, sk_c, k_c
) -> SchnorrProofDev:
    """st: [B] transcripts; pk: PointP [B]; sk/k canonical limbs [B, L]."""
    t = _aff(cv, _mul(cv, gen, k_c))
    batch = k_c.shape[:-1]
    blob = sj.concat_bytes(
        _base_pt_bytes(cv, gen, batch), sj.point_bytes(cv, pk), _aff_bytes(cv, t)
    )
    st = dt.absorb(st, blob)
    st, c_m = dt.sample_field(st, cv.fr)
    return SchnorrProofDev(t, _resp(cv, k_c, c_m, sk_c))


def schnorr_verify_dev(
    cv: Curve, st: dt.DTState, gen, pk: PointP, proof: SchnorrProofDev
) -> jnp.ndarray:
    batch = proof.s.shape[:-1]
    blob = sj.concat_bytes(
        _base_pt_bytes(cv, gen, batch), sj.point_bytes(cv, pk), _aff_bytes(cv, proof.t)
    )
    st = dt.absorb(st, blob)
    st, c_m = dt.sample_field(st, cv.fr)
    lhs = _mul(cv, gen, proof.s)
    rhs = cv.add(_aff_proj(cv, proof.t), cv.scalar_mul(cv.fr.from_mont(c_m), pk))
    return cv.eq(lhs, rhs)


# ---------------------------------------------------------------------------
# Chaum-Pedersen DL-equality
# ---------------------------------------------------------------------------


def cp_prove_dev(
    cv: Curve,
    st: dt.DTState,
    base_g,
    base_h,
    stmt_a: PointP,
    stmt_b: PointP,
    w_c,
    k_c,
) -> CPProofDev:
    """Prove a = w*g, b = w*h for [B] statements (one jit program)."""
    t_g = _aff(cv, _mul(cv, base_g, k_c))
    t_h = _aff(cv, _mul(cv, base_h, k_c))
    batch = k_c.shape[:-1]
    blob = sj.concat_bytes(
        _base_pt_bytes(cv, base_g, batch),
        _base_pt_bytes(cv, base_h, batch),
        sj.point_bytes(cv, stmt_a),
        sj.point_bytes(cv, stmt_b),
        _aff_bytes(cv, t_g),
        _aff_bytes(cv, t_h),
    )
    st = dt.absorb(st, blob)
    st, c_m = dt.sample_field(st, cv.fr)
    return CPProofDev(t_g, t_h, _resp(cv, k_c, c_m, w_c))


def cp_verify_dev(
    cv: Curve,
    st: dt.DTState,
    base_g,
    base_h,
    stmt_a: PointP,
    stmt_b: PointP,
    proof: CPProofDev,
) -> jnp.ndarray:
    batch = proof.s.shape[:-1]
    blob = sj.concat_bytes(
        _base_pt_bytes(cv, base_g, batch),
        _base_pt_bytes(cv, base_h, batch),
        sj.point_bytes(cv, stmt_a),
        sj.point_bytes(cv, stmt_b),
        _aff_bytes(cv, proof.t_g),
        _aff_bytes(cv, proof.t_h),
    )
    st = dt.absorb(st, blob)
    st, c_m = dt.sample_field(st, cv.fr)
    c_c = cv.fr.from_mont(c_m)
    lhs_g = _mul(cv, base_g, proof.s)
    rhs_g = cv.add(_aff_proj(cv, proof.t_g), cv.scalar_mul(c_c, stmt_a))
    lhs_h = _mul(cv, base_h, proof.s)
    rhs_h = cv.add(_aff_proj(cv, proof.t_h), cv.scalar_mul(c_c, stmt_b))
    return cv.eq(lhs_g, rhs_g) & cv.eq(lhs_h, rhs_h)


def init_batch(seeds: list[bytes]) -> dt.DTState:
    """B independent transcripts from per-statement seed bytes (host-side
    Blake2s of the static seeds, stacked)."""
    import hashlib

    words = np.stack(
        [np.frombuffer(hashlib.blake2s(s).digest(), dtype=np.uint32) for s in seeds]
    )
    return dt.DTState(jnp.asarray(words), jnp.zeros((len(seeds),), jnp.uint32))
