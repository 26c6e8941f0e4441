"""Shared group helpers: base-multiplication dispatch and transcript bytes.

A "base" for scalar multiplication is either a `FixedBaseTable` (per-game
precomputed windowed table — the fast path for the ElGamal generator, the
aggregate public key and Pedersen key elements) or a batched `PointP`
(variable bases, e.g. the card `c0` in reveal-token proofs,
`src/discrete_log_cards/mod.rs:311-314`).
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from ..ops.curve import Curve, PointP
from ..ops.msm import FixedBaseTable
from . import serialize

Base = Union[FixedBaseTable, PointP]


def base_mul(cv: Curve, base: Base, k_limbs) -> PointP:
    """k * base for canonical scalar limbs [..., L]."""
    if isinstance(base, FixedBaseTable):
        return base.mul(k_limbs)
    return cv.scalar_mul(k_limbs, base)


def base_point(cv: Curve, base: Base, batch_shape=()) -> PointP:
    """The base as a (broadcast) PointP."""
    if isinstance(base, FixedBaseTable):
        P = PointP(base.table.x[0, 1], base.table.y[0, 1], base.table.z[0, 1])
        return PointP(
            jnp.broadcast_to(P.x, batch_shape + P.x.shape[-1:]),
            jnp.broadcast_to(P.y, batch_shape + P.y.shape[-1:]),
            jnp.broadcast_to(P.z, batch_shape + P.z.shape[-1:]),
        )
    return base


def points_to_bytes(cv: Curve, P: PointP) -> list[bytes]:
    """Batched device points -> list of arkworks-`ToBytes` blobs (host),
    flattened C-order over the batch dims."""
    return [serialize.point_to_bytes(h, cv.host) for h in cv.to_host_points(P)]


def host_point_bytes(cv: Curve, hp) -> bytes:
    return serialize.point_to_bytes(hp, cv.host)


def concat_blobs(*groups: list[bytes]) -> list[bytes]:
    """Element-wise concatenation of equal-length byte-blob lists."""
    n = max(len(g) for g in groups)
    out = []
    for i in range(n):
        out.append(b"".join(g[i if len(g) > 1 else 0] for g in groups))
    return out


def scalars_to_limbs(vals, L: int) -> np.ndarray:
    from ..utils.rand import ints_to_limbs

    return ints_to_limbs(vals, L)
