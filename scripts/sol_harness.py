"""Speed-of-light harness for the L1 hot op (Pallas Montgomery multiply).

BASELINE.md:25 sets a >=90%-of-speed-of-light limb-mul target. The TPU's raw
u32-multiply issue rate is not published, so "speed of light" is MEASURED, not
assumed: a multiply-only Pallas kernel (same [L, B] limb-major layout, same
VMEM residency, nothing but the L*L 16x16-bit partial products of the
schoolbook convolution) establishes the attainable peak limb-multiply rate on
this chip; the real `mont_mul` kernel is then scored against it.

mont_mul useful work per element: 2 full L-limb convolutions (a*b and m*p,
L^2 muls each) + 1 truncated low convolution (~L^2/2) => 2.5*L^2 16x16 muls.
Everything else (carry pipelines, REDC bookkeeping, conditional subtract) is
overhead the SOL fraction charges against the kernel.

Usage: python scripts/sol_harness.py  -> one JSON line
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mental_poker_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _peak_kernel(L: int, BT: int):
    """Multiply-only kernel: the L^2 partial products of one convolution,
    folded into a running XOR so nothing is dead-code-eliminated."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = jnp.zeros_like(b)
        for i in range(L):
            acc = acc ^ (a[i][None] * b)  # [L, BT] u32 multiplies
        o_ref[:] = acc

    @jax.jit
    def run(a, b):
        B = a.shape[1]
        spec = pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
            grid=(B // BT,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a, b)

    return run


def _sync(x):
    # block_until_ready returns early through the axon relay (observed:
    # 64-deep kernel chains "completing" in 0.1 ms); a device_get of one
    # element is the only reliable execution barrier there.
    np.asarray(jax.device_get(x[:1, :1]))


def _time_fed(fn, x0, extra, reps):
    """Time fn(a, x) with x fed back from the previous call — every rep sees
    fresh data, so no relay/runtime layer can short-circuit repeated calls."""
    x = fn(extra, x0)
    _sync(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = fn(extra, x)
        _sync(x)
    return (time.perf_counter() - t0) / reps


def main():
    from mental_poker_tpu.ops import field as fm
    from mental_poker_tpu.ops.pallas import field as pf

    f = fm.stark_fq()
    L = f.L
    from mental_poker_tpu.config import get_config

    cfg = get_config()
    B = cfg.sol_batch
    reps = cfg.sol_reps

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (L, B), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (L, B), dtype=np.uint32))

    # peak: multiply-only kernel, L^2 muls per element per chain step; the
    # xor-fold output feeds back so reps can't be deduplicated. Delta-timing
    # two chain lengths cancels dispatch/transfer overheads.
    def peak_chain(K):
        kern = _peak_kernel(L, 512)

        @jax.jit
        def run(a, x):
            for _ in range(K):
                x = kern(a, x)
            return x

        return run

    # One LONG chain per call (K*work >> dispatch/transfer overheads); the
    # short-chain time is subtracted to cancel the constant per-call cost.
    K_LONG, K_SHORT = 64, 4
    p_long = _time_fed(peak_chain(K_LONG), b, a, reps)
    p_short = _time_fed(peak_chain(K_SHORT), b, a, reps)
    peak_gmul = (K_LONG - K_SHORT) * L * L * B / max(p_long - p_short, 1e-9) / 1e9

    run1 = pf._build(
        L,
        np.asarray(f.p_limbs, np.uint32).tobytes(),
        np.asarray(f.nprime_limbs, np.uint32).tobytes(),
        512,
        False,
    )

    def mm_chain(K):
        @jax.jit
        def run(a, x):
            for _ in range(K):
                x = run1(a, x)
            return x

        return run

    am = run1(a % jnp.uint32(1 << 15), b % jnp.uint32(1 << 15))
    m_long = _time_fed(mm_chain(K_LONG), am, am, reps)
    m_short = _time_fed(mm_chain(K_SHORT), am, am, reps)
    useful_gmul = (
        (K_LONG - K_SHORT) * 2.5 * L * L * B / max(m_long - m_short, 1e-9) / 1e9
    )
    sol = useful_gmul / peak_gmul

    print(
        json.dumps(
            {
                "metric": "mont_mul_sol_fraction",
                "value": round(sol, 4),
                "unit": "fraction of measured multiply-only peak",
                "peak_gmul_per_s": round(peak_gmul, 1),
                "mont_mul_useful_gmul_per_s": round(useful_gmul, 1),
                "elements": B,
                "limbs": L,
                "backend": jax.default_backend(),
                "raw_s": {"peak_long": round(p_long, 4), "peak_short": round(p_short, 4), "mm_long": round(m_long, 4), "mm_short": round(m_short, 4)},
            }
        )
    )


if __name__ == "__main__":
    main()
