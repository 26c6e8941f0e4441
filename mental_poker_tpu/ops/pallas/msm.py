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
import os

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


def _msm_kernel_chunked(
    p_ref, np_ref, a_ref, b3_ref, one_ref,
    px, py, pz, dg,
    ox, oy, oz,
    accx, accy, accz, fldx, fldy, fldz,
    *, L: int, NB: int, NC: int, W: int, Wp: int, T: int, c: int,
    emit: bool = False,
):
    """NC-points-per-step variant of `_msm_kernel` (round-5 latency lever).

    The original kernel is latency-bound: each of the N sequential steps is
    ~15 dependency-chained point adds on narrow [L, BT] tiles (measured
    ~9 ms/step at S=512 vs ~0.15 ms of compute, docs/PERF.md). This variant
    amortizes the chain over NC points at once:

      per chunk j (lax.fori over NB = ceil(N/NC)):
        build ALL NC multiples tables together      (T-2 adds on [L, NC, BT])
        digit-select per point                      (masked selects, no gather)
        tree-reduce the NC selected points          (log2(NC) add-LEVELS)
        one accumulate                              (1 add on [L, Wp, BT])

    Sequential add-DEPTH per point: (T-2 + log2(NC) + 1)/NC ~= 2.3 at NC=8
    vs T-1 = 15 before. Pad points are (0,0,0) with digit 0: the selects
    leave those slots at the identity, which adds exactly under the complete
    formulas.

    NOTE: everything here — VALUES and REFS — is rank <= 3 on purpose:
    - a 4D formulation (selects and tree levels as [L, NC, Wp, BT] arrays)
      passed interpret mode but crashed the Mosaic TPU compiler
      ("Check failed: limits[i] <= dim(i) (8 vs 1)" on the [L, NC, 1, BT]
      sublane broadcast);
    - integer indexing of a 3D VALUE (q[k] / q[:, k, None, :]) lowers to an
      unsupported >2D gather — `lax.slice_in_dim` is the working spelling;
    - 4D REFS with a dynamic leading index (px[j] on [NB, L, NC, BT]) hang
      the Mosaic/axon compile indefinitely (>25 min, never returns, at any
      NC) — inputs stay in the original kernel's 3D [Npad, L, BT] layout and
      each chunk is read as a contiguous `pl.ds(j*NC, NC)` leading-dim slice
      then transposed in-kernel.
    The 3D patterns below are the production-proven lowerings from
    `_msm_kernel`.
    """
    BT = px.shape[-1]
    p2 = p_ref[:]
    np2 = np_ref[:]
    a2 = a_ref[:]
    b32 = b3_ref[:]
    one2 = one_ref[:]

    def bcast_mid(q, M):  # [L, 1] -> [L, M, BT] (lanes, then sublanes)
        t = jnp.broadcast_to(q, (L, BT))
        return jnp.broadcast_to(t[:, None, :], (L, M, BT))

    cN = [bcast_mid(q, NC) for q in (a2, b32, p2, np2)]
    cW = [bcast_mid(q, Wp) for q in (a2, b32, p2, np2)]
    oneN = bcast_mid(one2, NC)
    oneW = bcast_mid(one2, Wp)

    def addN(P, Q):  # [L, NC, BT]
        return _rcb_add(*P, *Q, cN[0], cN[1], cN[2], cN[3], L, False)

    def addW(P, Q):  # [L, Wp, BT]
        return _rcb_add(*P, *Q, cW[0], cW[1], cW[2], cW[3], L, False)

    zeroW = jnp.zeros((L, Wp, BT), jnp.uint32)
    accx[...] = zeroW
    accy[...] = oneW
    accz[...] = zeroW

    from jax.experimental import pallas as pl

    def chunk_body(j, _):
        # contiguous NC-point block from the [Npad, L, BT] refs, limb-major
        base = j * NC
        X = jnp.moveaxis(px[pl.ds(base, NC)], 0, 1)  # [L, NC, BT]
        Y = jnp.moveaxis(py[pl.ds(base, NC)], 0, 1)
        Z = jnp.moveaxis(pz[pl.ds(base, NC)], 0, 1)
        zeroN = jnp.zeros((L, NC, BT), jnp.uint32)
        # multiples tables for all NC points at once (t=0 is the identity)
        tbl = [(zeroN, oneN, zeroN), (X, Y, Z)]
        for _ in range(T - 2):
            tbl.append(addN(tbl[-1], (X, Y, Z)))
        # per-point digit selects, then a pairwise tree over the NC selected
        # points: log2(NC) add-LEVELS (independent adds within a level).
        sel = []
        sl = lambda q, k: jax.lax.slice_in_dim(q, k, k + 1, axis=1)
        for k in range(NC):
            dk = dg[base + k]  # [Wp, BT]
            m = None
            ex, ey, ez = zeroW, oneW, zeroW
            for t in range(1, T):
                m = (dk == t)[None]  # [1, Wp, BT]
                ex = jnp.where(m, sl(tbl[t][0], k), ex)
                ey = jnp.where(m, sl(tbl[t][1], k), ey)
                ez = jnp.where(m, sl(tbl[t][2], k), ez)
            sel.append((ex, ey, ez))
        while len(sel) > 1:
            nxt = [addW(sel[i], sel[i + 1]) for i in range(0, len(sel) - 1, 2)]
            if len(sel) % 2:
                nxt.append(sel[-1])
            sel = nxt
        nx, ny, nz = addW((accx[...], accy[...], accz[...]), sel[0])
        accx[...] = nx
        accy[...] = ny
        accz[...] = nz
        return 0

    jax.lax.fori_loop(0, NB, chunk_body, 0)

    if emit:
        # window-sum output mode: the Horner fold runs OUTSIDE the kernel at
        # full statement width (pallas/curve.fold_windows) — a multi-block
        # grid otherwise repeats the W*(c+1)-add fold chain once per 128-lane
        # block, and that chain is the sequential floor once the point loop
        # is chunked.
        ox[...] = jnp.moveaxis(accx[...], 1, 0)
        oy[...] = jnp.moveaxis(accy[...], 1, 0)
        oz[...] = jnp.moveaxis(accz[...], 1, 0)
        return

    # Horner fold (identical to `_msm_kernel`): re-stage window-major so the
    # fold can dynamic-index the REF on its leading dim.
    fldx[...] = jnp.moveaxis(accx[...], 1, 0)
    fldy[...] = jnp.moveaxis(accy[...], 1, 0)
    fldz[...] = jnp.moveaxis(accz[...], 1, 0)

    def add2(P, Q):  # [L, BT]
        return _rcb_add(*P, *Q, a2, b32, p2, np2, L, False)

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
def _build_msm_chunked(
    L: int, NB: int, NC: int, W: int, c: int, consts_key: bytes, one_key: bytes,
    BT: int, interpret: bool, emit: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 1 << c
    Wp = _cdiv(W, _SUBLANE) * _SUBLANE
    cols = np.frombuffer(consts_key, dtype=np.uint32).reshape(4, L, 1)
    one_col = np.frombuffer(one_key, dtype=np.uint32).reshape(L, 1)
    kernel = functools.partial(
        _msm_kernel_chunked, L=L, NB=NB, NC=NC, W=W, Wp=Wp, T=T, c=c, emit=emit
    )

    Npad = NB * NC

    @jax.jit
    def run(px, py, pz, dg):  # [Npad, L, S] coords, [Npad, Wp, S] digits
        S = px.shape[-1]
        grid = (S // BT,)
        pspec = pl.BlockSpec((Npad, L, BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec((Npad, Wp, BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        if emit:
            ospec = pl.BlockSpec((Wp, L, BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
            shp = jax.ShapeDtypeStruct((Wp, L, S), jnp.uint32)
            scratch = [pltpu.VMEM((L, Wp, BT), jnp.uint32)] * 3 + [None] * 3
            scratch = [s for s in scratch if s is not None]
        else:
            ospec = pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM)
            shp = jax.ShapeDtypeStruct((L, S), jnp.uint32)
            scratch = [pltpu.VMEM((L, Wp, BT), jnp.uint32)] * 3 + [
                pltpu.VMEM((Wp, L, BT), jnp.uint32)
            ] * 3
        return pl.pallas_call(
            _kern_drop_fld(kernel) if emit else kernel,
            out_shape=(shp, shp, shp),
            grid=grid,
            in_specs=[cspec] * 5 + [pspec] * 3 + [dspec],
            out_specs=(ospec, ospec, ospec),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            *(jnp.asarray(q) for q in cols),
            jnp.asarray(one_col),
            px, py, pz, dg,
        )

    return run


def _kern_drop_fld(kernel):
    """Adapter: emit-mode passes no fld* scratch refs (3 scratch args)."""

    def k(p_ref, np_ref, a_ref, b3_ref, one_ref, px, py, pz, dg,
          ox, oy, oz, accx, accy, accz):
        return kernel(
            p_ref, np_ref, a_ref, b3_ref, one_ref, px, py, pz, dg,
            ox, oy, oz, accx, accy, accz, None, None, None,
        )

    return k


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

# Points folded per sequential kernel step (the chunked kernel); 1 selects
# the original one-point-per-step kernel. Env override: MPTPU_MSM_NC.
#
# Default 1: the chunked kernel is bit-correct on hardware (validated at
# nc=2 and nc=8, S=4 N=16) and cuts sequential add-depth ~6x, but its
# Mosaic/axon compile time explodes with NC at production shapes — the
# (N=52, S=512) verifier-combo program was still compiling after 55 min at
# NC=8 (vs 274 s for the NC=1 kernel at the same shape), which makes it
# undeployable through this round's relay. Opt in per call (nc=) or via
# MPTPU_MSM_NC once a faster-compiling toolchain is available.
DEFAULT_NC = int(os.environ.get("MPTPU_MSM_NC", "1") or 1)


def msm_lanes(cv, points, scalars, c: int = 4, block_lanes: int = 128,
              interpret: bool | None = None, nc: int | None = None):
    """sum_i scalars[s, i] * points[s, i] per statement s, VMEM-resident.

    points: PointP coords [S, N, L]; scalars: canonical limbs [S, N, L]
    (uint32 16-bit). Returns PointP [S, L]. Statements are lanes; N is
    chunked at MAX_N_PER_CALL with an XLA-level combine. `nc` = points per
    sequential kernel step (see `_msm_kernel_chunked`).
    """
    from ..curve import PointP
    from ..msm import scalar_digits

    if interpret is None:
        interpret = not available()
    if nc is None:
        nc = DEFAULT_NC
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
                c, block_lanes, interpret, nc,
            )
            out = part if out is None else cv.add(out, part)
        return out

    digits = scalar_digits(scalars, c, nbits)  # [W, S, N]
    dg = jnp.moveaxis(digits, 0, -1)  # [S, N, W]
    dg = jnp.pad(dg, ((0, Sp - S), (0, 0), (0, Wp - W))).astype(jnp.uint32)

    if nc > 1:
        NC = min(nc, N)
        NB = _cdiv(N, NC)
        padn = NB * NC - N
        # [S, N, W] -> [Npad, Wp, Sp]; pad points are digit-0 (identity)
        dgc = jnp.pad(dg, ((0, 0), (0, padn), (0, 0)))
        dgc = jnp.moveaxis(dgc, 0, -1)  # [Npad, Wp, Sp]

        def prepc(q):  # [S, N, L] -> [Npad, L, Sp]
            q2 = jnp.moveaxis(q, 0, -1)  # [N, L, S]
            return jnp.pad(q2, ((0, padn), (0, 0), (0, Sp - S)))

        run = _build_msm_chunked(
            L, NB, NC, W, c, _consts_key(cv),
            np.asarray(cv.fq.one_mont, np.uint32).tobytes(), BT, bool(interpret),
        )
        ox, oy, oz = run(prepc(points.x), prepc(points.y), prepc(points.z), dgc)
        post = lambda o: o[:, :S].T  # [S, L]
        return PointP(post(ox), post(oy), post(oz))

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
