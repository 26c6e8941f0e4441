"""Shared helpers for the Bayer-Groth argument stack (SURVEY §2.2 E8-E10).

The reference outsources these arguments to the unvendored `proof-essentials`
crate (`src/discrete_log_cards/mod.rs:20-24`); here they are rebuilt from the
Bayer-Groth 2012 paper ("Efficient Zero-Knowledge Argument for Correctness of
a Shuffle"), with this framework's own documented transcript schedule.

Conventions used across the stack:
- the deck of N = m*n entries is arranged as an m x n matrix, row-major;
- commitments are Pedersen vector commitments to n-vectors (crypto/pedersen);
- scalar/vector algebra runs host-side on Python ints (tiny data);
- all point algebra (commitments, MSM combos, verification equations) runs as
  batched device kernels.
"""

from __future__ import annotations

import numpy as np

from ..crypto import serialize
from ..crypto.pedersen import CommitKey
from ..ops import msm as msm_mod
from ..ops.curve import Curve, PointP
from ..utils.rand import ints_to_limbs


def com(ck: CommitKey, vec, r: int) -> tuple:
    """Commit a python-int vector (len <= n, zero-padded) -> host point."""
    v = list(vec) + [0] * (ck.n - len(vec))
    dev = ck.commit_ints(np.array([v], dtype=object), np.array([r], dtype=object))
    return ck.cv.to_host_points(dev)[0]

def com_many(ck: CommitKey, vecs, rs) -> list:
    """Commit a list of python-int vectors -> list of host points."""
    v = [list(vec) + [0] * (ck.n - len(vec)) for vec in vecs]
    dev = ck.commit_ints(np.array(v, dtype=object), np.array(list(rs), dtype=object))
    return ck.cv.to_host_points(dev)

def com_scalar(ck: CommitKey, v: int, r: int) -> tuple:
    """Single-value commitment = com((v, 0, ..., 0); r)."""
    return com(ck, [v], r)


def combo(cv: Curve, host_points: list, coeffs: list) -> tuple:
    """sum_k coeffs[k] * host_points[k] -> host point (device MSM)."""
    P = cv.from_host_points(host_points)
    k = ints_to_limbs(coeffs, cv.fr.L)
    return cv.to_host_points(msm_mod.msm(cv, P, k))[0]


def points_bytes(cv: Curve, host_points: list) -> bytes:
    return b"".join(serialize.point_to_bytes(p, cv.host) for p in host_points)


def bilinear(a, b, y, q) -> int:
    """<a, b>_y = sum_j a_j b_j y^(j+1) mod q (BG's star-product map)."""
    acc, yp = 0, y
    for aj, bj in zip(a, b):
        acc = (acc + aj * bj % q * yp) % q
        yp = yp * y % q
    return acc


def vec_add(a, b, q):
    return [(x + y) % q for x, y in zip(a, b)]


def vec_scale(a, c, q):
    return [x * c % q for x in a]


def vec_hadamard(a, b, q):
    return [x * y % q for x, y in zip(a, b)]


def powers(x, k, q, start=1):
    """[x^start, x^(start+1), ..., x^(start+k-1)] mod q."""
    out = []
    cur = pow(x, start, q)
    for _ in range(k):
        out.append(cur)
        cur = cur * x % q
    return out


def host_eq(cv: Curve, P, Q) -> bool:
    return P == Q  # host points are canonical (x, y, inf) tuples
