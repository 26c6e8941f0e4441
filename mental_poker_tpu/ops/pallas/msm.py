"""Fused Pallas TPU kernel for variable-base MSM (the named round-3 lever).

Role: the staged Bayer-Groth prover/verifier bottoms out in per-statement
MSMs — the multi-exp argument's diagonal MSMs and the verifier's deck-wide
homomorphic combos (docs/PERF.md: ~60% of batch time in round 3). The XLA
path (ops/msm.py `_msm_impl`) materializes a [W, B, N, L] gather from per-
point multiples tables in HBM and tree-sums it; this kernel keeps the WHOLE
MSM VMEM-resident per lane-block:

  for each point i (lax.fori over N):
      build its 2^c-entry multiples table in VMEM      (2^c - 2 adds, [L,BT])
      select each window's entry by digit — NO gather: a 2^c-way masked
      select over the table entries                     (VPU selects)
      one BATCHED point add folds all W windows at once ([L, W, BT] lanes)
  Horner-fold the W window accumulators                 (W*(c+1) adds, [L,BT])

HBM traffic: 3 coord arrays + digits in, 3 coords out — no [W,B,N,L]
intermediates. The W-vectorized accumulate turns the window loop into wide
[L, W*BT] VPU work instead of W narrow dispatches.

Layout: lanes = independent MSM statements (batch-first, like everything in
this framework); limb-major [.., L, lanes] as in ops/pallas/field.py.
Bit-exactness vs the jnp path is pinned by tests/test_pallas_msm.py.

Statement mapping (cited use-sites):
- verifier combos (arguments/staged.py p_combo): S = B*Q statements over the
  same per-B decks;
- multi-exp prep diagonals (p_me_prep): S = B*(2m) over deck_out;
- `parameter_selection.rs:3`'s m*N exponentiation cost model is the workload
  this engine serves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .curve import _consts_key, _rcb_add
from .field import available

_SUBLANE = 8  # uint32 min tile sublane multiple


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _msm_kernel(
    p_ref, np_ref, a_ref, b3_ref, one_ref,
    px, py, pz, dg,
    ox, oy, oz,
    accx, accy, accz, fldx, fldy, fldz,
    *, L: int, N: int, W: int, Wp: int, T: int, c: int,
):
    BT = px.shape[-1]
    # constants: [L, 1] columns. Mosaic cannot broadcast sublanes AND lanes in
    # one step (vector<1x1> -> vector<Wp x BT>), so full-shape constants are
    # materialized in two single-axis broadcasts: lanes first, then sublanes.
    p2 = p_ref[:]
    np2 = np_ref[:]
    a2 = a_ref[:]
    b32 = b3_ref[:]
    one2 = one_ref[:]

    def bcast3(q):  # [L, 1] -> [L, Wp, BT]
        t = jnp.broadcast_to(q, (L, BT))  # lane broadcast
        return jnp.broadcast_to(t[:, None, :], (L, Wp, BT))  # sublane

    p3, np3, a3, b33, one3 = (bcast3(q) for q in (p2, np2, a2, b32, one2))

    def add2(P, Q):  # [L, BT] point add
        return _rcb_add(*P, *Q, a2, b32, p2, np2, L, False)

    def add3(P, Q):  # [L, Wp, BT] batched point add (all windows at once)
        return _rcb_add(*P, *Q, a3, b33, p3, np3, L, False)

    zero3 = jnp.zeros((L, Wp, BT), jnp.uint32)
    accx[...] = zero3
    accy[...] = one3
    accz[...] = zero3

    def point_body(i, _):
        X, Y, Z = px[i], py[i], pz[i]  # [L, BT]
        one_b = jnp.broadcast_to(one2, (L, BT))
        zero_b = jnp.zeros((L, BT), jnp.uint32)
        # multiples table t*P for t in 0..T-1 (t=0 is the identity (0:1:0))
        tbl = [(zero_b, one_b, zero_b), (X, Y, Z)]
        for _ in range(T - 2):
            tbl.append(add2(tbl[-1], (X, Y, Z)))
        d = dg[i]  # [Wp, BT] digits (pad rows are 0 -> identity)
        ex, ey, ez = zero3, one3, zero3
        for t in range(1, T):
            m = (d == t)[None]  # [1, Wp, BT]
            ex = jnp.where(m, tbl[t][0][:, None, :], ex)
            ey = jnp.where(m, tbl[t][1][:, None, :], ey)
            ez = jnp.where(m, tbl[t][2][:, None, :], ez)
        nx, ny, nz = add3((accx[...], accy[...], accz[...]), (ex, ey, ez))
        accx[...] = nx
        accy[...] = ny
        accz[...] = nz
        return 0

    jax.lax.fori_loop(0, N, point_body, 0)

    # Horner fold over the real W windows, MSB first: acc = 2^c*acc + S_w.
    # The window accumulators are re-staged window-major ([Wp, L, BT]) so the
    # fold can dynamic-index the REF on its leading dim — the only dynamic
    # indexing Mosaic lowers (same pattern as pallas/curve._fold_kernel).
    fldx[...] = jnp.moveaxis(accx[...], 1, 0)
    fldy[...] = jnp.moveaxis(accy[...], 1, 0)
    fldz[...] = jnp.moveaxis(accz[...], 1, 0)

    def fold_body(wi, P):
        for _ in range(c):
            P = add2(P, P)
        w = W - 1 - wi
        s = (fldx[w], fldy[w], fldz[w])
        return add2(P, s)

    zero_b = jnp.zeros((L, BT), jnp.uint32)
    x, y, z = jax.lax.fori_loop(
        0, W, fold_body, (zero_b, zero_b + jnp.broadcast_to(one_ref[:], (L, BT)), zero_b)
    )
    ox[:] = x
    oy[:] = y
    oz[:] = z


@functools.cache
def _build_msm(
    L: int, N: int, W: int, c: int, consts_key: bytes, one_key: bytes,
    BT: int, interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 1 << c
    Wp = _cdiv(W, _SUBLANE) * _SUBLANE
    cols = np.frombuffer(consts_key, dtype=np.uint32).reshape(4, L, 1)
    one_col = np.frombuffer(one_key, dtype=np.uint32).reshape(L, 1)
    kernel = functools.partial(
        _msm_kernel, L=L, N=N, W=W, Wp=Wp, T=T, c=c
    )

    @jax.jit
    def run(px, py, pz, dg):  # [N, L, S] coords, [N, Wp, S] digits; S % BT == 0
        S = px.shape[-1]
        grid = (S // BT,)
        pspec = pl.BlockSpec((N, L, BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec((N, Wp, BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        shp = jax.ShapeDtypeStruct((L, S), jnp.uint32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp),
            grid=grid,
            in_specs=[cspec] * 5 + [pspec] * 3 + [dspec],
            out_specs=(ospec, ospec, ospec),
            scratch_shapes=[pltpu.VMEM((L, Wp, BT), jnp.uint32)] * 3
            + [pltpu.VMEM((Wp, L, BT), jnp.uint32)] * 3,
            # multi-block grids double-buffer the per-point input windows,
            # pushing peak VMEM past the 16 MB default scoped limit (measured
            # 18.3 MB at N=52, 8 blocks); v5e has headroom — raise the cap.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            *(jnp.asarray(q) for q in cols),
            jnp.asarray(one_col),
            px, py, pz, dg,
        )

    return run


# N larger than this is chunked with an XLA-level combine. The binding
# constraint is the ~16 MB scoped-VMEM limit: at BT=128 lanes the RCB
# addition's live [L, Wp, BT] temporaries dominate, and N=64 blocks measured
# 16.17 MB (172 KB over); N=52 — exactly the 52-card deck width — fits.
MAX_N_PER_CALL = 52


def msm_lanes(cv, points, scalars, c: int = 4, block_lanes: int = 128,
              interpret: bool | None = None):
    """sum_i scalars[s, i] * points[s, i] per statement s, VMEM-resident.

    points: PointP coords [S, N, L]; scalars: canonical limbs [S, N, L]
    (uint32 16-bit). Returns PointP [S, L]. Statements are lanes; N is
    chunked at MAX_N_PER_CALL with an XLA-level combine.
    """
    from ..curve import PointP
    from ..msm import scalar_digits

    if interpret is None:
        interpret = not available()
    L = cv.fq.L
    kL = scalars.shape[-1]
    S, N = points.x.shape[0], points.x.shape[1]
    nbits = cv.fr.bits
    W = _cdiv(nbits, c)
    Wp = _cdiv(W, _SUBLANE) * _SUBLANE
    BT = block_lanes
    Sp = _cdiv(S, BT) * BT

    if N > MAX_N_PER_CALL:
        out = None
        for lo in range(0, N, MAX_N_PER_CALL):
            hi = min(N, lo + MAX_N_PER_CALL)
            part = msm_lanes(
                cv,
                PointP(*(q[:, lo:hi] for q in points)),
                scalars[:, lo:hi],
                c, block_lanes, interpret,
            )
            out = part if out is None else cv.add(out, part)
        return out

    digits = scalar_digits(scalars, c, nbits)  # [W, S, N]
    dg = jnp.moveaxis(digits, 0, -1)  # [S, N, W]
    dg = jnp.pad(dg, ((0, Sp - S), (0, 0), (0, Wp - W))).astype(jnp.uint32)
    dg = jnp.moveaxis(dg, 0, -1)  # [N, Wp, Sp]

    def prep(q):  # [S, N, L] -> [N, L, Sp]
        q2 = jnp.moveaxis(q, 0, -1)  # [N, L, S]
        return jnp.pad(q2, ((0, 0), (0, 0), (0, Sp - S)))

    run = _build_msm(
        L, N, W, c, _consts_key(cv),
        np.asarray(cv.fq.one_mont, np.uint32).tobytes(), BT, bool(interpret),
    )
    ox, oy, oz = run(prep(points.x), prep(points.y), prep(points.z), dg)
    post = lambda o: o[:, :S].T  # [S, L]
    return PointP(post(ox), post(oy), post(oz))
