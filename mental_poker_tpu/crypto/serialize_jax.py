"""Device-side arkworks byte layouts (jit-friendly mirror of serialize.py).

Builds the exact `ToBytes` blobs the transcript absorbs (field elements as
canonical little-endian bytes sized to the 64-bit-word repr; affine points as
x || y || infinity_byte — reference use-sites `src/discrete_log_cards/
mod.rs:140,202,232,...`) as uint8 device arrays, so a whole prove/verify can
absorb without leaving the device. Byte-equality with the host layout is
pinned by tests/test_transcript_jax.py.

For every curve here the 16-bit-limb width equals the arkworks repr width
(2*L == 8*ceil(bits/64)), asserted in `field_bytes`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.curve import Curve, PointP
from ..ops.field import Field


def limbs_to_bytes(limbs: jnp.ndarray) -> jnp.ndarray:
    """Canonical uint32[..., L] 16-bit limbs -> uint8[..., 2L] LE bytes."""
    lo = limbs & jnp.uint32(0xFF)
    hi = (limbs >> jnp.uint32(8)) & jnp.uint32(0xFF)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(limbs.shape[:-1] + (2 * limbs.shape[-1],)).astype(jnp.uint8)


def bytes_to_limbs(b: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 2L] LE bytes -> uint32[..., L] 16-bit limbs."""
    v = b.astype(jnp.uint32).reshape(b.shape[:-1] + (b.shape[-1] // 2, 2))
    return v[..., 0] | (v[..., 1] << 8)


def field_bytes(fld: Field, canonical_limbs: jnp.ndarray) -> jnp.ndarray:
    """arkworks ToBytes for a canonical field element: LE bytes, repr width."""
    bits = fld.p.bit_length()
    repr_len = 8 * (-(-bits // 64))
    assert 2 * fld.L == repr_len, (fld.name, fld.L, repr_len)
    return limbs_to_bytes(canonical_limbs)


def point_bytes(cv: Curve, P: PointP) -> jnp.ndarray:
    """arkworks ToBytes for affine points: x || y || infinity(u8), canonical
    coords; identity writes 0 || 1 || 1 (serialize.py:38-48). Batched:
    PointP [..., L] -> uint8[..., 2*(2L)+1]."""
    f = cv.fq
    x_m, y_m, inf = cv.to_affine(P)
    x = f.from_mont(x_m)
    y = f.from_mont(y_m)
    xb = field_bytes(f, x)
    yb = field_bytes(f, y)
    infb = inf[..., None].astype(jnp.uint8)
    return jnp.concatenate([xb, yb, infb], axis=-1)


def points_blob(cv: Curve, P: PointP) -> jnp.ndarray:
    """Flatten a batch of points into ONE byte blob (C-order over batch dims),
    matching `b"".join(point_to_bytes(p) for p in host_points)`. The final
    axis is the concatenated byte stream."""
    pb = point_bytes(cv, P)  # [..., n, bytes] or [..., bytes]
    if pb.ndim == 1:
        return pb
    return pb.reshape(pb.shape[:-2] + (pb.shape[-2] * pb.shape[-1],))


def cipher_blob(cv: Curve, c0: PointP, c1: PointP) -> jnp.ndarray:
    """Ciphertext pairs -> (c0 || c1) per pair, concatenated along the pair
    axis (matches multi_exponentiation.cipher_bytes)."""
    b0 = point_bytes(cv, c0)  # [..., n, pb]
    b1 = point_bytes(cv, c1)
    both = jnp.concatenate([b0, b1], axis=-1)  # [..., n, 2pb]
    return both.reshape(both.shape[:-2] + (both.shape[-2] * both.shape[-1],))


def const_bytes(data: bytes, batch_shape: tuple = ()) -> jnp.ndarray:
    """Static bytes as a (broadcast) uint8 device array."""
    import numpy as np

    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    return jnp.broadcast_to(arr, batch_shape + arr.shape)


def u64_le_bytes(value: int, batch_shape: tuple = ()) -> jnp.ndarray:
    """A static u64 as 8 LE bytes (for the m/n statement suffix)."""
    return const_bytes(int(value).to_bytes(8, "little"), batch_shape)


def concat_bytes(*blobs: jnp.ndarray) -> jnp.ndarray:
    """Concatenate byte blobs along the last axis, broadcasting batch dims."""
    bshape = jnp.broadcast_shapes(*(b.shape[:-1] for b in blobs))
    parts = [jnp.broadcast_to(b, bshape + b.shape[-1:]) for b in blobs]
    return jnp.concatenate(parts, axis=-1)
