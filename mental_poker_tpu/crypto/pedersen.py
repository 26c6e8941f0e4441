"""Pedersen vector commitments (reference dependency E4,
`proof_essentials::vector_commitment::pedersen` — use-sites
`src/discrete_log_cards/mod.rs:18-19,111`).

commit(m_1..m_n; r) = r*H + sum_i m_i*G_i  over unknown-dlog generators.

The commit key is per-game fixed, so commitments are pure fixed-base MSMs over
precomputed windowed tables — the TPU fast path feeding the whole Bayer-Groth
stack (every sub-argument commits n-vectors; SURVEY §2.2 E8-E10).
"""

from __future__ import annotations

import numpy as np

from ..ops.curve import Curve, PointP
from ..ops.msm import FixedBaseMSM, FixedBaseTable
from ..utils.rand import GameRng, ints_to_limbs


class CommitKey:
    def __init__(self, cv: Curve, g_hosts: list, h_host):
        self.cv = cv
        self.n = len(g_hosts)
        self.g_hosts = g_hosts
        self.h_host = h_host
        self.g_msm = FixedBaseMSM(cv, g_hosts)
        self.h_table = FixedBaseTable(cv, h_host)

    def commit(self, vec_limbs, r_limbs) -> PointP:
        """vec_limbs: canonical [..., n, L]; r_limbs: [..., L] -> PointP [...]."""
        assert vec_limbs.shape[-2] == self.n, (vec_limbs.shape, self.n)
        return self.cv.add(self.g_msm.msm(vec_limbs), self.h_table.mul(r_limbs))

    def commit_ints(self, vec_ints, r_ints) -> PointP:
        """Commit from python-int vectors: [..., n] object array + [...] ints."""
        L = self.cv.fr.L
        return self.commit(ints_to_limbs(vec_ints, L), ints_to_limbs(r_ints, L))


def setup(cv: Curve, rng: GameRng, n: int) -> CommitKey:
    """`PedersenCommitment::setup(rng, n)` (`mod.rs:111`): n+1 random
    unknown-dlog generators via random-x decompression."""
    pts = [cv.host.rand_point(rng.rng) for _ in range(n + 1)]
    return CommitKey(cv, pts[:-1], pts[-1])
