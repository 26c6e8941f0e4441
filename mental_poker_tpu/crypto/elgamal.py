"""Batched ElGamal over an elliptic-curve group (reference dependency E3,
`proof_essentials::homomorphic_encryption::el_gamal` — use-sites
`src/discrete_log_cards/mod.rs:14-16,63-78`, `masking.rs:17`,
`remasking.rs:15-21`, `reveal.rs:14-18`).

Scheme (additive notation):
  keygen:   sk <- Fr,  pk = sk*G
  encrypt:  E(m; r) = (r*G, m + r*pk)
  decrypt:  m = c1 - sk*c0
Plaintexts are curve points; a "card" is a plaintext (`mod.rs:69`).

Everything is batch-first: a `Ciphertexts` holds [batch...] ciphertexts as two
projective point arrays; homomorphic ops are vectorized device point ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.curve import Curve, PointP
from ..ops.msm import FixedBaseTable
from ..utils.rand import GameRng, ints_to_limbs
from .group import Base, base_mul


class Ciphertexts(NamedTuple):
    """Batched ElGamal ciphertexts (c0, c1), coords [..., L]."""

    c0: PointP
    c1: PointP

    @property
    def batch_shape(self):
        return self.c0.x.shape[:-1]


class ElGamalParams:
    """`el_gamal::Parameters` (the encryption generator) plus its table."""

    def __init__(self, cv: Curve, generator_host):
        self.cv = cv
        self.generator = generator_host
        self.gen_table = FixedBaseTable(cv, generator_host)


def setup(cv: Curve, rng: GameRng) -> ElGamalParams:
    """`ElGamal::setup` — sample a random generator (`mod.rs:110`)."""
    return ElGamalParams(cv, cv.host.rand_point(rng.rng))


def keygen(pp: ElGamalParams, rng: GameRng):
    """-> (pk_host_point, sk_int) (`mod.rs:123-130`)."""
    sk = rng.scalar(pp.cv.host.order)
    pk = pp.cv.host.mul(sk, pp.generator)
    return pk, sk


def encrypt(pp: ElGamalParams, pk: Base, msgs: PointP, r_limbs) -> Ciphertexts:
    """E(m; r) = (r*G, m + r*pk), batched. `r_limbs`: canonical [..., L]."""
    cv = pp.cv
    c0 = pp.gen_table.mul(r_limbs)
    c1 = cv.add(msgs, base_mul(cv, pk, r_limbs))
    return Ciphertexts(c0, c1)


def encrypt_zero(pp: ElGamalParams, pk: Base, r_limbs) -> Ciphertexts:
    """E(0; r) — used by remasking (`remasking.rs:15-19`)."""
    cv = pp.cv
    return Ciphertexts(pp.gen_table.mul(r_limbs), base_mul(cv, pk, r_limbs))


def cipher_add(cv: Curve, a: Ciphertexts, b: Ciphertexts) -> Ciphertexts:
    return Ciphertexts(cv.add(a.c0, b.c0), cv.add(a.c1, b.c1))


def cipher_sub(cv: Curve, a: Ciphertexts, b: Ciphertexts) -> Ciphertexts:
    return Ciphertexts(
        cv.add(a.c0, cv.neg(b.c0)), cv.add(a.c1, cv.neg(b.c1))
    )


def cipher_neg(cv: Curve, a: Ciphertexts) -> Ciphertexts:
    return Ciphertexts(cv.neg(a.c0), cv.neg(a.c1))


def cipher_scalar_mul(cv: Curve, a: Ciphertexts, k_limbs) -> Ciphertexts:
    """a^k (elementwise over the batch)."""
    return Ciphertexts(cv.scalar_mul(k_limbs, a.c0), cv.scalar_mul(k_limbs, a.c1))


def cipher_identity(cv: Curve, batch_shape=()) -> Ciphertexts:
    return Ciphertexts(cv.identity(batch_shape), cv.identity(batch_shape))


def cipher_select(cv: Curve, cond, a: Ciphertexts, b: Ciphertexts) -> Ciphertexts:
    return Ciphertexts(cv.select(cond, a.c0, b.c0), cv.select(cond, a.c1, b.c1))


def cipher_sum(cv: Curve, a: Ciphertexts, axis: int) -> Ciphertexts:
    """Product (sum in additive notation) of ciphertexts along an axis."""
    ax = axis % a.c0.x.ndim if axis >= 0 else a.c0.x.ndim + axis
    return Ciphertexts(cv.sum_points(a.c0, axis=ax), cv.sum_points(a.c1, axis=ax))


def cipher_msm(cv: Curve, a: Ciphertexts, scalars, c: int = 4) -> Ciphertexts:
    """prod_i a_i^{s_i} along the second-to-last point axis (two MSMs)."""
    from ..ops import msm as msm_mod

    return Ciphertexts(
        msm_mod.msm(cv, a.c0, scalars, c), msm_mod.msm(cv, a.c1, scalars, c)
    )


def rand_ciphertexts(cv: Curve, rng: GameRng, n: int) -> Ciphertexts:
    """Uniformly random ciphertexts (`MaskedCard::rand`, `tests.rs:163,187`)."""
    pts0 = [cv.host.rand_point(rng.rng) for _ in range(n)]
    pts1 = [cv.host.rand_point(rng.rng) for _ in range(n)]
    return Ciphertexts(cv.from_host_points(pts0), cv.from_host_points(pts1))


def rand_plaintexts(cv: Curve, rng: GameRng, n: int) -> PointP:
    """Uniformly random plaintexts (`Card::rand`, `round.rs:213`)."""
    return cv.from_host_points([cv.host.rand_point(rng.rng) for _ in range(n)])
