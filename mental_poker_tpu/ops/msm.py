"""Multi-scalar multiplication engine (TPU-native, gather-based).

Serves every hot path of the protocol (SURVEY §3.3): Pedersen vector
commitments, ElGamal encrypt/remask/reveal exponentiations, batched sigma
verification, and the Bayer-Groth multi-exponentiation argument — the
reference's analytic cost model puts the shuffle prover at m*N curve
exponentiations (`examples/parameter_selection.rs:3`).

TPUs dislike scatter, so the classic Pippenger bucket accumulation is replaced
with two gather-friendly schemes:

- **Variable-base MSM** (`msm`): per-point windowed tables (c-bit windows).
  Table build: 2^c - 2 adds per point; main loop: one gather + tree-sum of N
  points per window + c doublings of the accumulator. ~(2^c + W) adds per
  point for W = ceil(bits/c) windows — ~5x fewer point ops than a binary
  ladder at c=4, all expressed as `take_along_axis` gathers and `lax.scan`.

- **Fixed-base multiply/MSM** (`FixedBaseTable`): full window tables
  T[w][d] = d * 2^(c*w) * B precomputed once per base (per game setup).
  A scalar multiply is then W-1 adds and zero doublings; every protocol
  mask/remask/commit hits this path.

Scalars enter in **canonical** (non-Montgomery) limb form, [..., L] uint32.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .curve import Curve, PointP
from .field import LIMB_BITS


def scalar_digits(k: jnp.ndarray, c: int, nbits: int) -> jnp.ndarray:
    """Canonical limbs [..., L] -> c-bit digits [W, ...] (LSB window first)."""
    assert LIMB_BITS % c == 0, "window must divide limb width"
    per_limb = LIMB_BITS // c
    W = -(-nbits // c)
    digs = []
    for w in range(W):
        limb = w // per_limb
        sh = (w % per_limb) * c
        digs.append((k[..., limb] >> sh) & ((1 << c) - 1))
    return jnp.stack(digs, axis=0)


def _gather_points(table: PointP, idx: jnp.ndarray) -> PointP:
    """table: PointP with coords [..., T, L]; idx: [...] -> PointP [..., L]."""
    ix = idx[..., None, None]
    L = table.x.shape[-1]

    def g(coord):
        return jnp.take_along_axis(coord, jnp.broadcast_to(ix, idx.shape + (1, L)), axis=-2)[
            ..., 0, :
        ]

    return PointP(g(table.x), g(table.y), g(table.z))


def build_tables(cv: Curve, P: PointP, c: int = 4) -> PointP:
    """Per-point multiples table: coords [..., 2^c, L]; entry d = d*P.
    Scan-built (one traced point-add) to keep compile time flat."""
    return cv.multiples_table(P, c)


_MSM_CACHE: dict = {}


def msm(
    cv: Curve,
    points: PointP,
    scalars: jnp.ndarray,
    c: int = 4,
    engine: str | None = None,
) -> PointP:
    """sum_i scalars[i] * points[i] over the second-to-last axis (jitted,
    cached per curve/window).

    points: PointP coords [..., N, L]; scalars: canonical limbs [..., N, L].
    Returns PointP [..., L].

    `engine` (TPU only; CPU always takes the gather path):
      "lanes"  — the VMEM-resident Pallas lane kernel (ops/pallas/msm.py):
                 statements on lanes, per-point sequential work. Wins when
                 per-statement latency or the [W,B,N,L] gather's HBM traffic
                 dominates (multi-exp diagonal prep; small batches); also the
                 workaround for the B=1 me_prep XLA:TPU miscompile
                 (docs/PERF.md).
      "gather" — the XLA path: per-point tables + one wide gather + N-axis
                 tree-sum + the Pallas window fold.
      None     — "lanes" on TPU (A/B on v5e: B=128 headline 26.0 pairs/s
                 warm vs 12.7 on gather; even at B=1's 4-lane combos the
                 lane kernel measured 1451 ms vs gather's 1737 ms — the
                 sequential window fold dominates both at tiny widths).
    Config kill-switch: config.pallas_msm=False forces gather everywhere.
    """
    from .pallas import field as pallas_field

    L = scalars.shape[-1]
    fL = points.x.shape[-1]
    N = points.x.shape[-2]
    batch = jnp.broadcast_shapes(points.x.shape[:-2], scalars.shape[:-2])
    B = int(np.prod(batch)) if batch else 1
    k = jnp.broadcast_to(scalars, batch + (N, L)).reshape(B, N, L)
    P = PointP(*(jnp.broadcast_to(q, batch + (N, fL)).reshape(B, N, fL) for q in points))

    from ..config import get_config

    if (
        engine != "gather"
        and pallas_field.use_pallas()
        and get_config().pallas_msm
        and (B >= 2 or N >= 16)
    ):
        from .pallas import msm as pallas_msm

        # Wide-split mapping (round-5): a small-statement-count MSM leaves
        # most of the kernel's 128 lanes idle while paying the full
        # sequential point loop — the BASELINE "1024-element deck" stress
        # shape is a single statement. Split each statement's N points
        # across F lanes (F a power of two), run the lane kernel on S*F
        # statements of N/F points, and tree-combine the F partials with one
        # XLA-level sum. msm_1024: 1024 sequential point-steps -> 8.
        F = 1
        nc = pallas_msm.DEFAULT_NC
        while B * F * 2 <= 128 and N >= 2 * F * max(nc, 8):
            F *= 2
        if F > 1:
            Nf = -(-N // F)
            if Nf * F != N:
                padn = Nf * F - N
                k = jnp.concatenate([k, jnp.zeros((B, padn, L), k.dtype)], 1)
                P = PointP(
                    *(jnp.concatenate([q, jnp.zeros((B, padn, fL), q.dtype)], 1) for q in P)
                )
            k = k.reshape(B * F, Nf, L)
            P = PointP(*(q.reshape(B * F, Nf, fL) for q in P))
            out = pallas_msm.msm_lanes(cv, P, k, c)
            out = PointP(*(q.reshape(B, F, fL) for q in out))
            out = cv.sum_points(out, axis=1)
        else:
            out = pallas_msm.msm_lanes(cv, P, k, c)
        return PointP(*(q.reshape(batch + (fL,)) for q in out))

    key = (id(cv), c)
    fn = _MSM_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda P, s: _msm_impl(cv, P, s, c))
        _MSM_CACHE[key] = fn
    # Canonicalize: pad flat batch and N to powers of two so callers share
    # compiled programs. Padding points are (0,0,0) with zero scalars: digit 0
    # gathers the table's identity entry, and adding the identity is exact
    # under the complete formulas — padded lanes cannot perturb the sum.
    Bp = 1 if B <= 1 else 1 << (B - 1).bit_length()
    Np = 1 if N <= 1 else 1 << (N - 1).bit_length()
    if Np != N:
        k = jnp.concatenate([k, jnp.zeros((B, Np - N, L), k.dtype)], 1)
        P = PointP(*(jnp.concatenate([q, jnp.zeros((B, Np - N, fL), q.dtype)], 1) for q in P))
    if Bp != B:
        k = jnp.concatenate([k, jnp.zeros((Bp - B, Np, L), k.dtype)], 0)
        P = PointP(*(jnp.concatenate([q, jnp.zeros((Bp - B, Np, fL), q.dtype)], 0) for q in P))
    out = fn(P, k)
    return PointP(*(q[:B].reshape(batch + (fL,)) for q in out))


def _msm_impl(cv: Curve, points: PointP, scalars: jnp.ndarray, c: int) -> PointP:
    """Window-parallel MSM: ALL W windows' gathers + N-axis tree-sums run as
    one wide batch (maximum lanes per kernel dispatch — the N-axis reduction
    is ~98% of the point-add work), leaving only the Horner fold over windows
    (W adds + c*W doublings on a [batch]-wide accumulator) sequential.

    The round-2 formulation looped windows sequentially, so every tree-sum
    ran at 1/W of the width and wall-clock was dominated by per-dispatch
    latency (measured 2.4 s vs ~0.25 s for the same MSM at B=64 on v5e).
    """
    nbits = cv.fr.bits
    W = -(-nbits // c)
    table = build_tables(cv, points, c)  # [..., N, T, L]
    digits = scalar_digits(scalars, c, nbits)  # [W, ..., N]

    # one gather for every window: [W, ..., N, L]
    ix = digits[..., None, None]
    L = table.x.shape[-1]

    def g(coord):
        return jnp.take_along_axis(
            coord[None],
            jnp.broadcast_to(ix, digits.shape + (1, L)),
            axis=-2,
        )[..., 0, :]

    pts = PointP(g(table.x), g(table.y), g(table.z))
    S = cv.sum_points(pts, axis=pts.x.ndim - 2)  # [W, ..., L]

    from .pallas import field as pallas_field

    if pallas_field.use_pallas():
        # whole fold VMEM-resident: one kernel instead of W*(c+1) dispatches
        from .pallas import curve as pallas_curve

        return pallas_curve.fold_windows(cv, S, c)

    # Horner fold, MSB window first: acc = 2^c * acc + S_w
    def body(acc, s):
        acc = jax.lax.fori_loop(0, c, lambda i, a: cv.dbl(a), acc)
        return cv.add(acc, PointP(*s)), None

    rev = tuple(jnp.flip(q, axis=0) for q in S)
    acc, _ = jax.lax.scan(body, cv.identity_like(points.x[..., 0, :]), rev)
    return acc


_BUILD_CACHE: dict = {}


# Fixed-base window width: 8 halves the per-multiply gather count (W=32 vs
# 63) at 16x the one-time per-game table-build work — the right trade on TPU.
# CPU CI keeps 4 so per-test game setups stay cheap. Configured via
# config.RuntimeConfig.fixed_window_bits (MPTPU_FIXED_WINDOW).


def default_fixed_window() -> int:
    from ..config import get_config

    return get_config().fixed_window_bits


def build_window_tables(cv: Curve, bases: PointP, c: int | None = None) -> PointP:
    """Full windowed tables for a batch of fixed bases, built ON DEVICE.

    bases: PointP [n, L] -> PointP [n, W, 2^c, L] with entry
    [i, w, d] = d * 2^(c*w) * bases[i].

    Device construction (vs the round-1 host Python loops, ~0.5 ms per EC
    add): row 0 is a scan-built multiples table; each later window row is the
    previous row doubled c times — all rows over the full [n, 2^c] width.
    Jitted with the bases as an ARGUMENT, so per-game random bases never get
    baked into the program as constants: one compiled program per (curve, n)
    serves every game/session via the persistent compile cache.
    """
    c = default_fixed_window() if c is None else c
    key = (id(cv), c)
    fn = _BUILD_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda b: _build_window_tables_impl(cv, b, c))
        _BUILD_CACHE[key] = fn
    return fn(bases)


def _build_window_tables_impl(cv: Curve, bases: PointP, c: int) -> PointP:
    nbits = cv.fr.bits
    W = -(-nbits // c)
    row0 = cv.multiples_table(bases, c)  # [n, 2^c, L]

    def body(row, _):
        nxt = row
        for _ in range(c):
            nxt = cv.dbl(nxt)
        return nxt, row

    _, rows = jax.lax.scan(body, row0, None, length=W)  # [W, n, 2^c, L]
    return PointP(*(jnp.moveaxis(q, 0, 1) for q in rows))  # [n, W, 2^c, L]


_FIXED_MUL_CACHE: dict = {}
_FIXED_MSM_CACHE: dict = {}


def fixed_mul(cv: Curve, table: PointP, scalars: jnp.ndarray, c: int | None = None) -> PointP:
    """scalars [..., L] * the base behind `table` ([W, 2^c, L] or
    [1, W, 2^c, L]): one flat gather of W window entries + a scan tree sum —
    W-1 point additions, no doublings. Jittable; table is an argument
    (see `build_window_tables`); the window width is derived from its shape."""
    if table.x.ndim == 4:
        table = PointP(*(q[0] for q in table))
    T = table.x.shape[-2]
    c = (T - 1).bit_length()
    nbits = cv.fr.bits
    W = -(-nbits // c)
    assert W == table.x.shape[0], (W, table.x.shape)
    digits = scalar_digits(scalars, c, nbits)  # [W, ...]
    digits = jnp.moveaxis(digits, 0, -1)  # [..., W]
    batch = scalars.shape[:-1]
    flat_idx = jnp.arange(W) * T + digits  # [..., W]
    L = table.x.shape[-1]

    def g(coord):
        flat = coord.reshape(-1, L)
        return flat[flat_idx.reshape(-1)].reshape(batch + (W, L))

    pts = PointP(g(table.x), g(table.y), g(table.z))
    return cv.sum_points(pts, axis=pts.x.ndim - 2)


def fixed_msm(cv: Curve, table: PointP, scalars: jnp.ndarray, c: int | None = None) -> PointP:
    """Fixed-base MSM: sum_i scalars[..., i, :] * bases[i] for a batch of
    bases' tables [n, W, 2^c, L]. Gather n*W entries, one scan tree sum.
    Jittable; table is an argument; window width derived from its shape."""
    T = table.x.shape[-2]
    c = (T - 1).bit_length()
    nbits = cv.fr.bits
    W = -(-nbits // c)
    n = table.x.shape[0]
    batch = scalars.shape[:-2]
    digits = scalar_digits(scalars, c, nbits)  # [W, ..., n]
    digits = jnp.moveaxis(digits, 0, -1)  # [..., n, W]
    flat_idx = (
        jnp.arange(n)[:, None] * (W * T) + jnp.arange(W)[None, :] * T + digits
    )  # [..., n, W]
    L = table.x.shape[-1]

    def g(coord):
        flat = coord.reshape(-1, L)
        return flat[flat_idx.reshape(-1)].reshape(batch + (n * W, L))

    pts = PointP(g(table.x), g(table.y), g(table.z))
    return cv.sum_points(pts, axis=pts.x.ndim - 2)


class FixedBaseTable:
    """Precomputed windowed table for one fixed base point.

    `table`: PointP [W, 2^c, L]; entry [w, d] = d * 2^(c*w) * B. Built on
    device (`build_window_tables`); `mul` dispatches to the shared jitted
    `fixed_mul` program with the table passed as an argument, so every
    FixedBaseTable instance (any game, any session) shares one compiled
    program per batch-size bucket.
    """

    def __init__(self, cv: Curve, host_point, c: int | None = None):
        c = default_fixed_window() if c is None else c
        self.cv = cv
        self.c = c
        self.nbits = cv.fr.bits
        self.W = -(-self.nbits // c)
        self.host_point = host_point
        t = build_window_tables(cv, cv.from_host_points([host_point]), c)
        self.table = PointP(*(q[0] for q in t))  # [W, 2^c, L]

    def mul(self, scalars: jnp.ndarray) -> PointP:
        """scalars: canonical limbs [..., L] -> PointP [..., L]. Works both
        eagerly (canonicalized batch for compile-cache reuse) and under an
        enclosing jit trace (plain call)."""
        cv = self.cv
        key = (id(cv), self.c)
        fn = _FIXED_MUL_CACHE.get(key)
        if fn is None:
            fn = jax.jit(lambda t, k: fixed_mul(cv, t, k, self.c))
            _FIXED_MUL_CACHE[key] = fn
        if isinstance(scalars, jax.core.Tracer):
            return fixed_mul(cv, self.table, scalars, self.c)
        L = scalars.shape[-1]
        batch = scalars.shape[:-1]
        B = int(np.prod(batch)) if batch else 1
        Bp = 1 if B <= 1 else 1 << (B - 1).bit_length()
        k = jnp.asarray(scalars).reshape(B, L)
        if Bp != B:
            k = jnp.concatenate([k, jnp.zeros((Bp - B, L), k.dtype)], 0)
        out = fn(self.table, k)
        fL = out.x.shape[-1]
        return PointP(*(q[:B].reshape(batch + (fL,)) for q in out))


class FixedBaseMSM:
    """Fixed-base MSM over a vector of fixed bases (e.g. a Pedersen commit
    key): result = sum_i scalars[..., i] * bases[i]. Tables are built on
    device and passed as jit arguments (see `FixedBaseTable`)."""

    def __init__(self, cv: Curve, host_points, c: int | None = None):
        c = default_fixed_window() if c is None else c
        self.cv = cv
        self.c = c
        self.nbits = cv.fr.bits
        self.W = -(-self.nbits // c)
        self.n = len(host_points)
        self.host_points = list(host_points)
        self.table = build_window_tables(
            cv, cv.from_host_points(host_points), c
        )  # [n, W, 2^c, L]

    def msm(self, scalars: jnp.ndarray) -> PointP:
        """scalars: canonical limbs [..., n, L] -> PointP [..., L]."""
        cv = self.cv
        key = (id(cv), self.c)
        fn = _FIXED_MSM_CACHE.get(key)
        if fn is None:
            fn = jax.jit(lambda t, k: fixed_msm(cv, t, k, self.c))
            _FIXED_MSM_CACHE[key] = fn
        if isinstance(scalars, jax.core.Tracer):
            return fixed_msm(cv, self.table, scalars, self.c)
        L = scalars.shape[-1]
        n = scalars.shape[-2]
        batch = scalars.shape[:-2]
        B = int(np.prod(batch)) if batch else 1
        Bp = 1 if B <= 1 else 1 << (B - 1).bit_length()
        k = jnp.asarray(scalars).reshape(B, n, L)
        if Bp != B:
            k = jnp.concatenate([k, jnp.zeros((Bp - B, n, L), k.dtype)], 0)
        out = fn(self.table, k)
        fL = out.x.shape[-1]
        return PointP(*(q[:B].reshape(batch + (fL,)) for q in out))
