"""Validate the MSM engine against host bigint ground truth on the live
backend (TPU: the Pallas lane kernel; CPU: the jnp gather path).

The interpret-mode CI test (tests/test_pallas_msm.py, marked slow) covers the
kernel off-TPU; this script is the fast on-hardware gate — it checks the
exact batch shapes the staged Bayer-Groth pipeline dispatches (verifier deck
combos, l3 combos, me_prep diagonals) plus edge scalars.

Usage: python scripts/msm_kernel_check.py   -> prints per-shape OK/FAIL, one
JSON summary line, exit 1 on any mismatch.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MPTPU_FIXED_WINDOW", "8")

from mental_poker_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.ops import curve as curve_mod, msm as msm_mod
from mental_poker_tpu.ops.curve import PointP
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs

cv = curve_mod.stark_curve()
rng = GameRng(77)
q = cv.host.order


def check(Bshape, N, kints=None):
    S = int(np.prod(Bshape))
    pts_flat = elgamal.rand_plaintexts(cv, rng, S * N)
    L = pts_flat.x.shape[-1]
    pts = PointP(*(p.reshape(Bshape + (N, L)) for p in pts_flat))
    if kints is None:
        kints = [[rng.scalar(q) for _ in range(N)] for _ in range(S)]
    k = jnp.asarray(ints_to_limbs(kints, cv.fr.L).reshape(Bshape + (N, cv.fr.L)))
    out = msm_mod.msm(cv, pts, k)
    got = cv.to_host_points(PointP(*(o.reshape(S, -1) for o in out)))
    hosts = cv.to_host_points(pts_flat)
    bad = 0
    for s in range(S):
        acc = cv.host.identity
        for i in range(N):
            acc = cv.host.add(acc, cv.host.mul(kints[s][i] % q, hosts[s * N + i]))
        if got[s] != acc:
            bad += 1
    print(f"msm batch={Bshape} N={N}: {'OK' if not bad else f'FAIL ({bad}/{S})'}",
          flush=True)
    return bad


fails = 0
fails += check((1, 4), 52)   # B=1 verifier deck combos
fails += check((2, 4), 52)
fails += check((1, 8), 52)   # B=1 me_prep diagonals
fails += check((1, 7), 52)   # l3 combo group (batch pads 7 -> 8)
fails += check((1, 2), 4)
# edge scalars: 0, 1, q-1, and an identity point in the mix
fails += check((1, 1), 4, kints=[[0, 1, q - 1, 2]])
# N-chunking path (N > MAX_N_PER_CALL on the kernel route)
fails += check((1, 2), 100)

print(json.dumps({
    "metric": "msm_kernel_check",
    "backend": jax.default_backend(),
    "failures": fails,
}))
sys.exit(1 if fails else 0)
