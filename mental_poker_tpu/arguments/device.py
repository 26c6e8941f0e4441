"""Shared types and point/byte helpers for the device-resident shuffle proof.

Defines the proof/key/randomness pytrees (`ShuffleProofDev`, `ShuffleKeys`,
`ShuffleRand`, ...) and small affine-point helpers consumed by the staged
prover/verifier (`arguments/staged.py`) and the host bridge
(`arguments/device_api.py`).

Reference roles: E8-E10 of SURVEY §2.2 (`proof_essentials::zkp::arguments::
shuffle`, use-sites `src/discrete_log_cards/mod.rs:397-415,427-442`).
Protocol/math notes live in the host reference modules
(arguments/{zero,single_value_product,hadamard,product,
multi_exponentiation,shuffle}.py); the staged stack mirrors their absorb
schedules byte-for-byte (pinned by tests/test_device_arguments.py).

Conventions:
- Fr values flow in Montgomery form; proof scalars are emitted canonical.
- Proof points are emitted affine (`AffP`) — host conversion and transcript
  byte-building share one batched inversion per absorb group.
- `ShuffleKeys` (all per-game tables) is a jit ARGUMENT, so one compiled
  program per (curve, m, n) serves every game and session.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..crypto import serialize_jax as sj
from ..ops.curve import Curve, PointP


class AffP(NamedTuple):
    """Affine points: x/y Montgomery limbs [..., L], inf bool [...]."""

    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


class ShuffleKeys(NamedTuple):
    """Per-game fixed-base tables (jit argument; see module docstring)."""

    gen: PointP  # ElGamal generator table [W, T, L]
    pk: PointP  # aggregate public key table [W, T, L]
    ckg: PointP  # Pedersen vector generators [n, W, T, L]
    ckh: PointP  # Pedersen blinding generator [W, T, L]
    sgen: PointP  # extra shuffle generator G' [W, T, L]


class ShuffleRand(NamedTuple):
    """Prover randomness, canonical limbs (host-sampled, device-consumed)."""

    r: jnp.ndarray  # [m, L]   c_a commit randomness
    s: jnp.ndarray  # [m, L]   c_b commit randomness
    prod_s: jnp.ndarray  # [L]  product-arg c_b commit randomness
    had_sB: jnp.ndarray  # [max(m-2,0), L]
    zero_a0: jnp.ndarray  # [n, L]
    zero_r0: jnp.ndarray  # [L]
    zero_bm1: jnp.ndarray  # [n, L]
    zero_sm1: jnp.ndarray  # [L]
    zero_t: jnp.ndarray  # [2m+1, L]
    svp_d: jnp.ndarray  # [n, L]
    svp_rd: jnp.ndarray  # [L]
    svp_delta: jnp.ndarray  # [n, L]
    svp_s1: jnp.ndarray  # [L]
    svp_sx: jnp.ndarray  # [L]
    me_a0: jnp.ndarray  # [n, L]
    me_r0: jnp.ndarray  # [L]
    me_b: jnp.ndarray  # [2m, L]
    me_s: jnp.ndarray  # [2m, L]
    me_tau: jnp.ndarray  # [2m, L]


class ZeroProofDev(NamedTuple):
    c_a0: AffP  # []
    c_bm1: AffP  # []
    c_d: AffP  # [2m+1]
    a: jnp.ndarray  # [n, L] canonical
    r: jnp.ndarray  # [L]
    b: jnp.ndarray  # [n, L]
    s: jnp.ndarray  # [L]
    t: jnp.ndarray  # [L]


class HadamardProofDev(NamedTuple):
    c_B_mid: AffP  # [m-2] (empty when m == 2)
    zero: ZeroProofDev


class SVPProofDev(NamedTuple):
    c_d: AffP
    c_delta: AffP
    c_Delta: AffP
    a_tilde: jnp.ndarray  # [n, L]
    r_tilde: jnp.ndarray  # [L]
    b_tilde: jnp.ndarray  # [n, L]
    s_tilde: jnp.ndarray  # [L]


class ProductProofDev(NamedTuple):
    c_b: AffP
    hadamard: HadamardProofDev
    svp: SVPProofDev


class MultiExpProofDev(NamedTuple):
    c_a0: AffP
    c_b: AffP  # [2m]
    e0: AffP  # [2m] ciphertext first components
    e1: AffP  # [2m]
    a: jnp.ndarray  # [n, L]
    r: jnp.ndarray  # [L]
    b: jnp.ndarray  # [L]
    s: jnp.ndarray  # [L]
    tau: jnp.ndarray  # [L]


class ShuffleProofDev(NamedTuple):
    c_a: AffP  # [m]
    c_b: AffP  # [m]
    product: ProductProofDev
    multi_exp: MultiExpProofDev


class ShuffleChecks(NamedTuple):
    """Per-sub-argument verification flags; the wrapper raises in the
    reference's observable order (Hadamard -> SVP -> MultiExp)."""

    hadamard: jnp.ndarray
    svp: jnp.ndarray
    multi_exp: jnp.ndarray


# ---------------------------------------------------------------------------
# small point/byte helpers
# ---------------------------------------------------------------------------


def to_aff(cv: Curve, P: PointP) -> AffP:
    x, y, inf = cv.to_affine(P)
    return AffP(x, y, inf)


def aff_to_proj(cv: Curve, a: AffP) -> PointP:
    return cv.from_affine(a.x, a.y, a.inf)


def aff_bytes(cv: Curve, a: AffP) -> jnp.ndarray:
    """ToBytes blob straight from affine coords (no inversion)."""
    f = cv.fq
    xb = sj.field_bytes(f, f.from_mont(a.x))
    yb = sj.field_bytes(f, f.from_mont(a.y))
    infb = a.inf[..., None].astype(jnp.uint8)
    return jnp.concatenate([xb, yb, infb], axis=-1)


def aff_blob(cv: Curve, a: AffP) -> jnp.ndarray:
    """Concatenated blob over the last point axis (points_bytes order)."""
    pb = aff_bytes(cv, a)
    if pb.ndim == 1:
        return pb
    return pb.reshape(pb.shape[:-2] + (pb.shape[-2] * pb.shape[-1],))


def cat_affs(*affs: AffP) -> AffP:
    parts = []
    for a in affs:
        if a.x.shape[0] == 0 and a.x.ndim >= 2:
            parts.append(a)
        elif a.inf.ndim == 0:
            parts.append(AffP(a.x[None], a.y[None], a.inf[None]))
        else:
            parts.append(a)
    return AffP(
        jnp.concatenate([p.x for p in parts], 0),
        jnp.concatenate([p.y for p in parts], 0),
        jnp.concatenate([p.inf for p in parts], 0),
    )


def table_base(table: PointP) -> PointP:
    """The base point behind a [W, T, L] window table (entry [0, 1])."""
    return PointP(table.x[0, 1], table.y[0, 1], table.z[0, 1])
