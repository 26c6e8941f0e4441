"""Pallas variable-base MSM kernel vs the jnp MSM path (bit-exactness).

Runs in interpreter mode on the CPU backend (same pattern as
tests/test_pallas_{field,curve}.py); the compiled path is exercised on real
TPU by bench.py and scripts/msm_kernel_check.py.

Marked slow: the interpret lowering unrolls the whole windowed MSM into one
giant XLA:CPU program whose FIRST compile takes ~an hour on this 2-core host
(the real-TPU Mosaic compile of the same kernel is ~7 s). Cached afterwards.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.ops import curve as curve_mod, msm as msm_mod
from mental_poker_tpu.ops.curve import PointP
from mental_poker_tpu.ops.pallas import msm as pmsm
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs


@pytest.fixture(scope="module")
def cv():
    return curve_mod.stark_curve()


def _setup(cv, S, N, seed=3):
    rng = GameRng(seed)
    q = cv.host.order
    pts_flat = elgamal.rand_plaintexts(cv, rng, S * N)
    L = pts_flat.x.shape[-1]
    pts = PointP(*(p.reshape(S, N, L) for p in pts_flat))
    k = ints_to_limbs(
        [[rng.scalar(q) for _ in range(N)] for _ in range(S)], cv.fr.L
    )
    return pts, jnp.asarray(k)


def test_msm_lanes_matches_jnp_msm(cv):
    S, N = 3, 5
    pts, k = _setup(cv, S, N)
    want = msm_mod.msm(cv, pts, k)  # [S, L]
    got = pmsm.msm_lanes(cv, pts, k, interpret=True)
    ok = np.asarray(cv.eq(got, want))
    assert ok.shape == (S,) and bool(ok.all())


def test_msm_lanes_edge_scalars(cv):
    """Zero scalars, scalar = order-1, and identity points in the mix."""
    S, N = 2, 4
    pts, _ = _setup(cv, S, N, seed=9)
    q = cv.host.order
    ks = [[0, 1, q - 1, 2], [q - 1, 0, 0, q - 1]]
    k = jnp.asarray(ints_to_limbs(ks, cv.fr.L))
    # plant an identity point (0,0,0 projective zero encoding)
    zz = jnp.zeros_like(pts.x[:, :1])
    pts = PointP(
        jnp.concatenate([zz, pts.x[:, 1:]], 1),
        jnp.concatenate([zz, pts.y[:, 1:]], 1),
        jnp.concatenate([zz, pts.z[:, 1:]], 1),
    )
    want = msm_mod.msm(cv, pts, k)
    got = pmsm.msm_lanes(cv, pts, k, interpret=True)
    assert bool(np.asarray(cv.eq(got, want)).all())


def test_msm_lanes_chunked_n(cv, monkeypatch):
    """The N-chunking path (MAX_N_PER_CALL) combines partials exactly."""
    monkeypatch.setattr(pmsm, "MAX_N_PER_CALL", 3)
    S, N = 2, 7
    pts, k = _setup(cv, S, N, seed=11)
    want = msm_mod.msm(cv, pts, k)
    got = pmsm.msm_lanes(cv, pts, k, interpret=True)
    assert bool(np.asarray(cv.eq(got, want)).all())
