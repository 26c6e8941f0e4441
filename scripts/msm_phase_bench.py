"""Phase microbench of the lane-MSM kernel at S=512, N=52 (the combo shape).

Variants:
  full    — the real kernel (table build + select + add3 + fold)
  notbl   — skip table build/select: add3 accumulates P directly each point
  nofold  — full minus the Horner fold (write acc[0] out)
  foldonly— only the fold over precomputed zeros
Times are per pallas_call on [N, L, 512] inputs (4 grid blocks), device_get
fenced.

STATUS (round 4): the combo stage measures ~9 ms/point-step at S=512 vs a
~0.15 ms compute estimate — the kernel is NOT compute-bound, and this
harness exists to blame the phase. CAVEAT: on first use the cloned "full"
variant hit a Mosaic compiler crash ("Check failed: limits[i] <= dim(i)
(8 vs 1)") that the production kernel (ops/pallas/msm.py, identical body
via msm_lanes) does not — diff the clone against the module before
trusting numbers. Suspects for the gap: fori_loop trip overhead, scratch
read-modify-write serialization, the 15x3 select chains.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mental_poker_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import functools
import jax, numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mental_poker_tpu.ops import curve as curve_mod
from mental_poker_tpu.ops.pallas.curve import _consts_key, _rcb_add
from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs
from mental_poker_tpu.ops.msm import scalar_digits

cv = curve_mod.stark_curve()
L, c = cv.fq.L, 4
W = -(-cv.fr.bits // c)
Wp = 64
T = 16
N, S, BT = 52, 512, 128


def make_kernel(mode):
    def kern(p_ref, np_ref, a_ref, b3_ref, one_ref, px, py, pz, dg, ox, oy, oz,
             accx, accy, accz, fldx, fldy, fldz):
        p2, np2, a2, b32, one2 = p_ref[:], np_ref[:], a_ref[:], b3_ref[:], one_ref[:]

        def bcast3(q):
            t = jnp.broadcast_to(q, (L, BT))
            return jnp.broadcast_to(t[:, None, :], (L, Wp, BT))

        p3, np3, a3, b33, one3 = (bcast3(q) for q in (p2, np2, a2, b32, one2))

        def add2(P, Q):
            return _rcb_add(*P, *Q, a2, b32, p2, np2, L, False)

        def add3(P, Q):
            return _rcb_add(*P, *Q, a3, b33, p3, np3, L, False)

        zero3 = jnp.zeros((L, Wp, BT), jnp.uint32)
        accx[...] = zero3
        accy[...] = one3
        accz[...] = zero3

        def point_body(i, _):
            X, Y, Z = px[i], py[i], pz[i]
            one_b = jnp.broadcast_to(one2, (L, BT))
            zero_b = jnp.zeros((L, BT), jnp.uint32)
            if mode == "notbl":
                ex = jnp.broadcast_to(X[:, None, :], (L, Wp, BT))
                ey = jnp.broadcast_to(Y[:, None, :], (L, Wp, BT))
                ez = jnp.broadcast_to(Z[:, None, :], (L, Wp, BT))
            else:
                tbl = [(zero_b, one_b, zero_b), (X, Y, Z)]
                for _ in range(T - 2):
                    tbl.append(add2(tbl[-1], (X, Y, Z)))
                d = dg[i]
                ex, ey, ez = zero3, one3, zero3
                for t in range(1, T):
                    m = (d == t)[None]
                    ex = jnp.where(m, tbl[t][0][:, None, :], ex)
                    ey = jnp.where(m, tbl[t][1][:, None, :], ey)
                    ez = jnp.where(m, tbl[t][2][:, None, :], ez)
            nx, ny, nz = add3((accx[...], accy[...], accz[...]), (ex, ey, ez))
            accx[...] = nx
            accy[...] = ny
            accz[...] = nz
            return 0

        if mode != "foldonly":
            jax.lax.fori_loop(0, N, point_body, 0)

        if mode == "nofold":
            ox[:] = accx[:, 0, :]
            oy[:] = accy[:, 0, :]
            oz[:] = accz[:, 0, :]
            return

        fldx[...] = jnp.moveaxis(accx[...], 1, 0)
        fldy[...] = jnp.moveaxis(accy[...], 1, 0)
        fldz[...] = jnp.moveaxis(accz[...], 1, 0)

        def fold_body(wi, P):
            for _ in range(c):
                P = add2(P, P)
            w = W - 1 - wi
            return add2(P, (fldx[w], fldy[w], fldz[w]))

        zero_b = jnp.zeros((L, BT), jnp.uint32)
        x, y, z = jax.lax.fori_loop(
            0, W, fold_body,
            (zero_b, zero_b + jnp.broadcast_to(one_ref[:], (L, BT)), zero_b))
        ox[:] = x
        oy[:] = y
        oz[:] = z

    return kern


cols = np.frombuffer(_consts_key(cv), dtype=np.uint32).reshape(4, L, 1)
one_col = np.asarray(cv.fq.one_mont, np.uint32).reshape(L, 1)


def build(mode):
    kern = make_kernel(mode)

    @jax.jit
    def run(px, py, pz, dg):
        grid = (S // BT,)
        pspec = pl.BlockSpec((N, L, BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec((N, Wp, BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        shp = jax.ShapeDtypeStruct((L, S), jnp.uint32)
        return pl.pallas_call(
            kern, out_shape=(shp, shp, shp), grid=grid,
            in_specs=[cspec] * 5 + [pspec] * 3 + [dspec],
            out_specs=(ospec, ospec, ospec),
            scratch_shapes=[pltpu.VMEM((L, Wp, BT), jnp.uint32)] * 3
            + [pltpu.VMEM((Wp, L, BT), jnp.uint32)] * 3,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(*(jnp.asarray(q) for q in cols), jnp.asarray(one_col), px, py, pz, dg)

    return run


rng = GameRng(5)
pts = elgamal.rand_plaintexts(cv, rng, S * N)
q = cv.host.order
k = ints_to_limbs([[rng.scalar(q) for _ in range(N)] for _ in range(S)], cv.fr.L)
digits = scalar_digits(jnp.asarray(k), c, cv.fr.bits)
dg = jnp.moveaxis(jnp.pad(jnp.moveaxis(digits, 0, -1), ((0, 0), (0, 0), (0, Wp - W))).astype(jnp.uint32), 0, -1)
prep = lambda a: jnp.moveaxis(a.reshape(S, N, L), 0, -1)
px, py, pz = prep(pts.x), prep(pts.y), prep(pts.z)


def sync(o):
    np.asarray(jax.device_get(o[0][:1, :1]))


for mode in ("full", "notbl", "nofold", "foldonly"):
    f = build(mode)
    out = f(px, py, pz, dg)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(px, py, pz, dg)
        sync(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{mode:9s}: {dt*1e3:8.1f} ms", flush=True)
