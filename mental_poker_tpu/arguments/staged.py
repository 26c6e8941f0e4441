"""Staged device programs for the Bayer-Groth shuffle argument.

Architecture (round-2 rework): a SINGLE fused XLA program for the whole
prove/verify traces ~120k HLO ops and takes ~16 min to compile; pure host
orchestration (round 1) pays a device->host sync per transcript interaction
(~72 per proof). This module takes the middle road that wins on both axes:

- the prove/verify flows are split into ~20 SMALL jitted stage programs
  (commit, absorb+sample, algebra prep, openings, one generic padded MSM
  for the verifier's homomorphic combos);
- all state between stages stays ON DEVICE (transcript state, Montgomery
  vectors, points) — the host only sequences ~20 dispatches per proof and
  never reads a value back until the proof/flags are done;
- every stage is BATCH-FIRST: all arrays carry a leading [B] proof axis, so
  one dispatch sequence proves B independent shuffles (the dispatch cost
  amortizes to ~nothing);
- per-game tables (`ShuffleKeys`) are stage ARGUMENTS, so programs hit the
  persistent compile cache across games and sessions.

Math/protocol notes live in the host reference modules
(arguments/{zero,single_value_product,hadamard,product,
multi_exponentiation,shuffle}.py); transcript byte schedules here mirror them
exactly (interop pinned by tests/test_device_arguments.py).
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto import serialize_jax as sj
from ..crypto import transcript_jax as dt
from ..crypto.elgamal import Ciphertexts
from ..crypto.transcript import SHUFFLE_RNG_SEED
from ..ops import msm as msm_mod
from ..ops.curve import Curve, PointP
from ..ops.msm import fixed_mul, fixed_msm
from .device import (
    AffP,
    HadamardProofDev,
    MultiExpProofDev,
    ProductProofDev,
    ShuffleChecks,
    ShuffleKeys,
    ShuffleProofDev,
    ShuffleRand,
    SVPProofDev,
    ZeroProofDev,
    aff_blob,
    aff_bytes,
    aff_to_proj,
    table_base,
    to_aff,
)

_NO_MID = b"hadamard:no-mid"


def _tree_root_dev(leaf_bytes: jnp.ndarray) -> jnp.ndarray:
    """Binary Blake2s Merkle root of uint8[..., k, nbytes] leaves ->
    uint8[..., 32]. Odd nodes promote unchanged (host twin:
    arguments/shuffle.py `_deck_root`)."""
    from ..crypto import hash_jax

    h = hash_jax.blake2s_bytes(leaf_bytes)  # [..., k, 32]
    k = h.shape[-2]
    while k > 1:
        half = k // 2
        pairs = jnp.concatenate(
            [h[..., 0 : 2 * half : 2, :], h[..., 1 : 2 * half : 2, :]], axis=-1
        )  # [..., half, 64]
        nh = hash_jax.blake2s_bytes(pairs)
        if k % 2:
            nh = jnp.concatenate([nh, h[..., -1:, :]], axis=-2)
        h = nh
        k = h.shape[-2]
    return h[..., 0, :]


def _deck_root_dev(cv, deck: Ciphertexts) -> jnp.ndarray:
    """Merkle root over per-card (c0 || c1) ToBytes leaves: [B, N] -> [B, 32]."""
    leaves = jnp.concatenate(
        [sj.point_bytes(cv, deck.c0), sj.point_bytes(cv, deck.c1)], axis=-1
    )  # [B, N, 2*pb]
    return _tree_root_dev(leaves)

_PROGS: dict = {}

# Per-stage wall-clock accounting, enabled by MPTPU_STAGE_TIMING=1:
# key -> [total_s, calls, first_call_s]. The first call includes compile
# (or persistent-cache load); steady-state cost is (total - first)/(calls - 1).
STAGE_TIMES: dict = {}

# Debug switch: when True, verify() returns (ShuffleChecks, dict of the raw
# sub-check flags) so a failing flag can be localized without re-deriving the
# whole verifier by hand. Keyed into the program cache, so flipping it only
# recompiles the (tiny) flags program.
DEBUG_FLAGS = False


def stage_report() -> list:
    """[(key, steady_ms_per_call, calls, first_s)] sorted by total steady time."""
    rows = []
    for k, (tot, n, first) in STAGE_TIMES.items():
        steady = (tot - first) / (n - 1) if n > 1 else first
        rows.append((k, steady * 1e3, n, first))
    rows.sort(key=lambda r: -(r[1] * max(r[2] - 1, 1)))
    return rows


# True while a FUSED whole-prove/verify program is being traced: stage
# wrappers must not fence/time tracers (see StagedShuffle.prove docstring).
_FUSING = [False]


def _prog(key, builder):
    fn = _PROGS.get(key)
    if fn is None:
        jfn = jax.jit(builder())
        from ..config import get_config

        if get_config().stage_timing:

            def timed(*a, _jfn=jfn, _key=key, **kw):
                if _FUSING[0]:
                    return _jfn(*a, **kw)
                t0 = time.perf_counter()
                out = _jfn(*a, **kw)
                jax.block_until_ready(out)
                dt = time.perf_counter() - t0
                rec = STAGE_TIMES.setdefault(_key, [0.0, 0, dt])
                rec[0] += dt
                rec[1] += 1
                return out

            fn = timed
        else:
            fn = jfn
        _PROGS[key] = fn
    return fn


def _commit_canon(cv, keys, vec_c, r_c):
    n = keys.ckg.x.shape[0]
    k = vec_c.shape[-2]
    if k < n:
        pad = jnp.zeros(vec_c.shape[:-2] + (n - k, vec_c.shape[-1]), vec_c.dtype)
        vec_c = jnp.concatenate([vec_c, pad], axis=-2)
    return cv.add(fixed_msm(cv, keys.ckg, vec_c), fixed_mul(cv, keys.ckh, r_c))


def _scalar_vecs(vals, n):
    """[..., K, L] scalar values -> [..., K, n, L] vectors (v, 0, ..., 0)."""
    K, L = vals.shape[-2], vals.shape[-1]
    pad = jnp.zeros(vals.shape[:-1] + (n - 1, L), vals.dtype)
    return jnp.concatenate([vals[..., None, :], pad], axis=-2)


class StagedShuffle:
    """Stage-program orchestrator for one (curve, m, n) configuration.

    `prove`/`verify` take batch-first arrays ([B] leading) and dispatch the
    cached stage programs; all intermediate state is device-resident.
    """

    def __init__(self, cv: Curve, m: int, n: int):
        assert m >= 2, "Bayer-Groth Hadamard reduction needs m >= 2"
        self.cv = cv
        self.m = m
        self.n = n
        self.N = m * n
        self.fr = cv.fr

    # -------------------------------------------------------------- programs
    def _k(self, name, *extra):
        return (name, self.cv.name, self.m, self.n) + extra

    def p_stmt(self):
        cv, m, n, N = self.cv, self.m, self.n, self.N

        def build():
            def run(keys, din, dout):
                B = din.c0.x.shape[0]
                st = dt.init(SHUFFLE_RNG_SEED, (B,))
                pk_pt = table_base(keys.pk)
                # statement absorb v2 (own-spec; see arguments/shuffle.py):
                # per-card leaf hashes + binary Merkle roots replace the flat
                # deck byte stream — the flat stream forced ~214 SEQUENTIAL
                # Blake2s compressions per absorb; the tree is depth ~log2(N)
                # with every level fully lane-parallel.
                root_in = _deck_root_dev(cv, din)
                root_out = _deck_root_dev(cv, dout)
                blob = sj.concat_bytes(
                    sj.points_blob(cv, pk_pt),
                    root_in,
                    root_out,
                    sj.u64_le_bytes(m),
                    sj.u64_le_bytes(n),
                )
                return dt.absorb(st, blob)

            return run

        return _prog(self._k("stmt"), build)

    def p_commit(self, K: int):
        cv = self.cv

        def build():
            def run(keys, vecs_c, rs_c):
                return to_aff(cv, _commit_canon(cv, keys, vecs_c, rs_c))

            return run

        return _prog((("commit", cv.name, self.n, K)), build)

    def p_abs_pts(self, K: int, nch: int):
        cv, fr = self.cv, self.fr

        def build():
            def run(st, aff):
                st = dt.absorb(st, aff_blob(cv, aff))
                chs = []
                for _ in range(nch):
                    st, c = dt.sample_field(st, fr)
                    chs.append(c)
                return (st,) + tuple(chs)

            return run

        return _prog(self._k("abs_pts", K, nch), build)

    def p_abs_const(self, data: bytes, nch: int):
        cv, fr = self.cv, self.fr

        def build():
            def run(st):
                st = dt.absorb(st, sj.const_bytes(data, st.widx.shape))
                chs = []
                for _ in range(nch):
                    st, c = dt.sample_field(st, fr)
                    chs.append(c)
                return (st,) + tuple(chs)

            return run

        return _prog(self._k("abs_const", data, nch), build)

    def p_abs_me(self):
        cv, fr = self.cv, self.fr

        def build():
            def run(st, pts_aff, e0, e1):
                eb = jnp.concatenate(
                    [aff_bytes(cv, e0), aff_bytes(cv, e1)], axis=-1
                )  # [B, 2m, 2pb]
                e_blob = eb.reshape(eb.shape[:-2] + (eb.shape[-2] * eb.shape[-1],))
                st = dt.absorb(st, sj.concat_bytes(aff_blob(cv, pts_aff), e_blob))
                st, x = dt.sample_field(st, fr)
                return st, x

            return run

        return _prog(self._k("abs_me"), build)

    def p_make_a(self):
        m, n, N, fr = self.m, self.n, self.N, self.fr

        def build():
            def run(pi):
                B = pi.shape[0]
                a = jnp.zeros((B, N, fr.L), jnp.uint32)
                a = a.at[..., 0].set(pi.astype(jnp.uint32) + 1)
                return a.reshape(B, m, n, fr.L)

            return run

        return _prog(self._k("make_a"), build)

    def p_make_b(self):
        m, n, N, fr = self.m, self.n, self.N, self.fr

        def build():
            def run(x_m, pi):
                B = pi.shape[0]
                xpow = fr.powers(x_m, N)  # [B, N, L]
                b_m = jnp.take_along_axis(
                    xpow, pi[..., None].astype(jnp.int32), axis=1
                )
                return fr.from_mont(b_m).reshape(B, m, n, fr.L)

            return run

        return _prog(self._k("make_b"), build)

    def p_prod_prep(self):
        m, n, N, fr = self.m, self.n, self.N, self.fr

        def build():
            def run(x_m, y_m, z_m, pi, r_c, s_c, prod_s_c):
                B = pi.shape[0]
                a_c = jnp.zeros((B, N, fr.L), jnp.uint32)
                a_c = a_c.at[..., 0].set(pi.astype(jnp.uint32) + 1)
                a_m = fr.to_mont(a_c)
                xpow = fr.powers(x_m, N)
                b_m = jnp.take_along_axis(
                    xpow, pi[..., None].astype(jnp.int32), axis=1
                )
                zb = jnp.broadcast_to(z_m[:, None, :], b_m.shape)
                dz_m = fr.sub(fr.add(fr.mont_mul(y_m[:, None, :], a_m), b_m), zb)
                r_m = fr.to_mont(r_c)
                s_m = fr.to_mont(s_c)
                t_m = fr.add(fr.mont_mul(y_m[:, None, :], r_m), s_m)  # [B, m, L]
                i_m = fr.to_mont(
                    jnp.broadcast_to(
                        jnp.asarray(fr.small_int_limbs(np.arange(1, N + 1))),
                        (B, N, fr.L),
                    )
                )
                terms = fr.sub(fr.add(fr.mont_mul(y_m[:, None, :], i_m), xpow), zb)
                v_m = fr.prod_mod(terms, axis=1)
                dz_rows = dz_m.reshape(B, m, n, fr.L)
                b_vec_m = fr.prod_mod(dz_rows, axis=1)  # [B, n, L]
                cpb_vec_c = fr.from_mont(b_vec_m)[:, None]  # [B, 1, n, L]
                prod_s_m = fr.to_mont(prod_s_c)
                return dz_rows, t_m, b_vec_m, v_m, cpb_vec_c, prod_s_m

            return run

        return _prog(self._k("prod_prep"), build)

    def p_had_mids(self):
        m, n, fr = self.m, self.n, self.fr

        def build():
            def run(dz_rows_m, t_m, prod_s_m, had_sB_c):
                # partial products B_i and their commit randomness s_B
                B_m = jax.lax.associative_scan(fr.mont_mul, dz_rows_m, axis=1)
                s_B_m = jnp.concatenate(
                    [t_m[:, :1], fr.to_mont(had_sB_c), prod_s_m[:, None]], axis=1
                )  # [B, m, L]
                mid_vecs_c = fr.from_mont(B_m[:, 1:-1])  # [B, m-2, n, L]
                mid_rs_c = fr.from_mont(s_B_m[:, 1:-1])
                return B_m, s_B_m, mid_vecs_c, mid_rs_c

            return run

        return _prog(self._k("had_mids"), build)

    def p_had_prep(self):
        m, n, fr = self.m, self.n, self.fr

        def build():
            def run(hx_m, B_m, s_B_m, dz_rows_m, t_m):
                B = hx_m.shape[0]
                xi = fr.powers(hx_m, m + 1, start=0)  # [B, m+1, L]
                d_rows = fr.mont_mul(B_m[:, : m - 1], xi[:, 1:m, None, :])
                d_sum = fr.sum_mod(
                    fr.mont_mul(B_m[:, 1:m], xi[:, 1:m, None, :]), axis=1
                )
                t_sum = fr.sum_mod(fr.mont_mul(xi[:, 1:m], s_B_m[:, 1:m]), axis=1)
                A_rows = jnp.concatenate([d_rows, d_sum[:, None]], axis=1)
                R_rows = jnp.concatenate(
                    [fr.mont_mul(xi[:, 1:m], s_B_m[:, : m - 1]), t_sum[:, None]],
                    axis=1,
                )
                minus1 = fr.neg(
                    jnp.broadcast_to(jnp.asarray(fr.one_mont), (B, 1, n, fr.L))
                )
                B_rows = jnp.concatenate([dz_rows_m[:, 1:], minus1], axis=1)
                S_rows = jnp.concatenate(
                    [t_m[:, 1:], jnp.zeros((B, 1, fr.L), jnp.uint32)], axis=1
                )
                return A_rows, R_rows, B_rows, S_rows

            return run

        return _prog(self._k("had_prep"), build)

    def p_zero_prep(self):
        m, n, fr = self.m, self.n, self.fr

        def build():
            def run(hy_m, A_rows, R_rows, B_rows, S_rows, a0_c, r0_c, bm1_c, sm1_c, t_c):
                B = hy_m.shape[0]
                a0 = fr.to_mont(a0_c)
                r0 = fr.to_mont(r0_c)
                bm1 = fr.to_mont(bm1_c)
                sm1 = fr.to_mont(sm1_c)
                t = fr.to_mont(t_c)  # [B, 2m+1, L]
                t = t.at[:, m + 1].set(jnp.zeros_like(t[:, 0]))

                A = jnp.concatenate([a0[:, None], A_rows], axis=1)  # rows 0..m
                Bv = jnp.concatenate([B_rows, bm1[:, None]], axis=1)  # rows 1..m+1
                R = jnp.concatenate([r0[:, None], R_rows], axis=1)
                S = jnp.concatenate([S_rows, sm1[:, None]], axis=1)

                ypow = fr.powers(hy_m, n)  # [B, n, L]
                # batched bilinears: stack all (i, j) diagonal pairs
                pairs = []
                for k in range(2 * m + 1):
                    for i in range(0, m + 1):
                        j = m + 1 + i - k
                        if 1 <= j <= m + 1:
                            pairs.append((k, i, j - 1))
                ii = np.array([p[1] for p in pairs])
                jj = np.array([p[2] for p in pairs])
                prods = fr.mont_mul(A[:, ii], Bv[:, jj])  # [B, P, n, L]
                terms = fr.sum_mod(
                    fr.mont_mul(prods, ypow[:, None]), axis=2
                )  # [B, P, L]
                d = []
                for k in range(2 * m + 1):
                    sel = [idx for idx, p in enumerate(pairs) if p[0] == k]
                    acc = terms[:, sel[0]]
                    for s_ in sel[1:]:
                        acc = fr.add(acc, terms[:, s_])
                    d.append(acc)
                d_m = jnp.stack(d, axis=1)  # [B, 2m+1, L]

                vecs_c = jnp.concatenate(
                    [
                        fr.from_mont(a0)[:, None],
                        fr.from_mont(bm1)[:, None],
                        _scalar_vecs(fr.from_mont(d_m), n),
                    ],
                    axis=1,
                )  # [B, 2m+3, n, L]
                rs_c = jnp.concatenate(
                    [
                        fr.from_mont(r0)[:, None],
                        fr.from_mont(sm1)[:, None],
                        fr.from_mont(t),
                    ],
                    axis=1,
                )  # [B, 2m+3, L]
                return vecs_c, rs_c, A, Bv, R, S, t

            return run

        return _prog(self._k("zero_prep"), build)

    def p_zero_open(self):
        m, fr = self.m, self.fr

        def build():
            def run(zx_m, A, Bv, R, S, t):
                xi = fr.powers(zx_m, 2 * m + 2, start=0)  # [B, 2m+2, L]
                co = xi[:, : m + 1]
                a_open = fr.sum_mod(fr.mont_mul(A, co[..., None, :]), axis=1)
                r_open = fr.sum_mod(fr.mont_mul(R, co), axis=1)
                rev = jnp.flip(co, axis=1)
                b_open = fr.sum_mod(fr.mont_mul(Bv, rev[..., None, :]), axis=1)
                s_open = fr.sum_mod(fr.mont_mul(S, rev), axis=1)
                t_open = fr.sum_mod(fr.mont_mul(t, xi[:, : 2 * m + 1]), axis=1)
                return tuple(
                    fr.from_mont(v) for v in (a_open, r_open, b_open, s_open, t_open)
                )

            return run

        return _prog(self._k("zero_open"), build)

    def p_svp_prep(self):
        n, fr = self.n, self.fr

        def build():
            def run(b_vec_m, d_c, rd_c, delta_c, s1_c, sx_c):
                B = b_vec_m.shape[0]
                d = fr.to_mont(d_c)
                delta = fr.to_mont(delta_c)
                delta = delta.at[:, 0].set(d[:, 0])
                delta = delta.at[:, n - 1].set(jnp.zeros_like(d[:, 0]))
                bpart = jax.lax.associative_scan(fr.mont_mul, b_vec_m, axis=1)
                cdel = fr.neg(fr.mont_mul(delta[:, :-1], d[:, 1:]))  # [B, n-1]
                cDel = fr.sub(
                    fr.sub(delta[:, 1:], fr.mont_mul(b_vec_m[:, 1:], delta[:, :-1])),
                    fr.mont_mul(bpart[:, :-1], d[:, 1:]),
                )
                zpad = jnp.zeros((B, 1, fr.L), jnp.uint32)
                vecs_c = jnp.stack(
                    [
                        d_c,
                        jnp.concatenate([fr.from_mont(cdel), zpad], axis=1),
                        jnp.concatenate([fr.from_mont(cDel), zpad], axis=1),
                    ],
                    axis=1,
                )  # [B, 3, n, L]
                rs_c = jnp.stack([rd_c, s1_c, sx_c], axis=1)
                return vecs_c, rs_c, bpart, d, delta

            return run

        return _prog(self._k("svp_prep"), build)

    def p_svp_open(self):
        fr = self.fr

        def build():
            def run(svx_m, b_vec_m, prod_s_m, bpart, d, delta, rd_c, s1_c, sx_c):
                x = svx_m[:, None, :]
                a_t = fr.add(fr.mont_mul(x, b_vec_m), d)
                b_t = fr.add(fr.mont_mul(x, bpart), delta)
                r_t = fr.add(fr.mont_mul(svx_m, prod_s_m), fr.to_mont(rd_c))
                s_t = fr.add(
                    fr.mont_mul(svx_m, fr.to_mont(sx_c)), fr.to_mont(s1_c)
                )
                return (
                    fr.from_mont(a_t),
                    fr.from_mont(r_t),
                    fr.from_mont(b_t),
                    fr.from_mont(s_t),
                )

            return run

        return _prog(self._k("svp_open"), build)

    def p_me_prep(self):
        cv, m, n, N, fr = self.cv, self.m, self.n, self.N, self.fr

        def build():
            def run(keys, dout, x_m, pi, s_c, rho_c, a0_c, r0_c, b_c, sk_c, tau_c):
                B = pi.shape[0]
                xpow = fr.powers(x_m, N)
                b_m = jnp.take_along_axis(
                    xpow, pi[..., None].astype(jnp.int32), axis=1
                )  # [B, N, L]
                rho_m = fr.to_mont(rho_c)
                rho_star = fr.neg(fr.sum_mod(fr.mont_mul(rho_m, b_m), axis=1))

                a0 = fr.to_mont(a0_c)
                b_k = fr.to_mont(b_c)
                s_k = fr.to_mont(sk_c)
                tau_k = fr.to_mont(tau_c)
                zero = jnp.zeros((B, fr.L), jnp.uint32)
                b_k = b_k.at[:, m].set(zero)
                s_k = s_k.at[:, m].set(zero)
                tau_k = tau_k.at[:, m].set(rho_star)

                rows = jnp.concatenate(
                    [a0[:, None], b_m.reshape(B, m, n, fr.L)], axis=1
                )  # exponent rows 0..m
                r_full_m = jnp.concatenate(
                    [fr.to_mont(r0_c)[:, None], fr.to_mont(s_c)], axis=1
                )  # [B, m+1, L]

                # blinds E(b_k G'; tau_k)
                tau_cc = fr.from_mont(tau_k)
                bcc = fr.from_mont(b_k)
                bl0 = fixed_mul(cv, keys.gen, tau_cc)
                bl1 = cv.add(
                    fixed_mul(cv, keys.sgen, bcc), fixed_mul(cv, keys.pk, tau_cc)
                )

                # diagonals, batched into one MSM with [B, 2m] leading dims
                C = Ciphertexts(
                    PointP(
                        dout.c0.x.reshape(B, m, n, -1),
                        dout.c0.y.reshape(B, m, n, -1),
                        dout.c0.z.reshape(B, m, n, -1),
                    ),
                    PointP(
                        dout.c1.x.reshape(B, m, n, -1),
                        dout.c1.y.reshape(B, m, n, -1),
                        dout.c1.z.reshape(B, m, n, -1),
                    ),
                )
                sel_ids = np.zeros((2 * m, m), np.int32)
                scal_rows = []
                zero_row = jnp.zeros((B, n, fr.L), jnp.uint32)
                for k in range(2 * m):
                    srows = []
                    slot = 0
                    for i in range(1, m + 1):
                        j = k - m + i
                        if 0 <= j <= m:
                            sel_ids[k, slot] = i - 1
                            srows.append(fr.from_mont(rows[:, j]))
                            slot += 1
                    while slot < m:
                        srows.append(zero_row)
                        slot += 1
                    scal_rows.append(jnp.concatenate(srows, axis=1))
                scal = jnp.stack(scal_rows, axis=1)  # [B, 2m, m*n, L]
                idx = jnp.asarray(sel_ids)
                L = dout.c0.x.shape[-1]

                def gather(P: PointP) -> PointP:
                    return PointP(
                        P.x[:, idx].reshape(B, 2 * m, m * n, L),
                        P.y[:, idx].reshape(B, 2 * m, m * n, L),
                        P.z[:, idx].reshape(B, 2 * m, m * n, L),
                    )

                # one MSM over both ciphertext components: [B, 4m, m*n]
                g0, g1 = gather(C.c0), gather(C.c1)
                gboth = PointP(
                    jnp.concatenate([g0.x, g1.x], 1),
                    jnp.concatenate([g0.y, g1.y], 1),
                    jnp.concatenate([g0.z, g1.z], 1),
                )
                dboth = msm_mod.msm(
                    cv, gboth, jnp.concatenate([scal, scal], 1), engine="lanes"
                )
                d0 = PointP(dboth.x[:, : 2 * m], dboth.y[:, : 2 * m], dboth.z[:, : 2 * m])
                d1 = PointP(dboth.x[:, 2 * m :], dboth.y[:, 2 * m :], dboth.z[:, 2 * m :])
                e0 = cv.add(bl0, d0)
                e1 = cv.add(bl1, d1)
                e0a = to_aff(cv, e0)
                e1a = to_aff(cv, e1)

                vecs_c = jnp.concatenate(
                    [a0_c[:, None], _scalar_vecs(fr.from_mont(b_k), n)], axis=1
                )  # [B, 1+2m, n, L]
                rs_c = jnp.concatenate(
                    [r0_c[:, None], fr.from_mont(s_k)], axis=1
                )
                return e0a, e1a, vecs_c, rs_c, rows, r_full_m, b_k, s_k, tau_k

            return run

        return _prog(self._k("me_prep"), build)

    def p_me_open(self):
        m, fr = self.m, self.fr

        def build():
            def run(mex_m, rows, r_full_m, b_k, s_k, tau_k):
                xj = fr.powers(mex_m, 2 * m, start=0)  # [B, 2m, L]
                co = xj[:, : m + 1]
                a_open = fr.sum_mod(fr.mont_mul(rows, co[..., None, :]), axis=1)
                r_open = fr.sum_mod(fr.mont_mul(r_full_m, co), axis=1)
                b_open = fr.sum_mod(fr.mont_mul(b_k, xj), axis=1)
                s_open = fr.sum_mod(fr.mont_mul(s_k, xj), axis=1)
                tau_open = fr.sum_mod(fr.mont_mul(tau_k, xj), axis=1)
                return tuple(
                    fr.from_mont(v)
                    for v in (a_open, r_open, b_open, s_open, tau_open)
                )

            return run

        return _prog(self._k("me_open"), build)

    # ------------------------------------------------------------ prove flow
    def prove(
        self,
        keys: ShuffleKeys,
        deck_in: Ciphertexts,
        deck_out: Ciphertexts,
        pi: jnp.ndarray,  # int32 [B, N]
        rho_c: jnp.ndarray,  # canonical [B, N, L]
        rand: ShuffleRand,  # leaves with [B] leading dim
    ) -> ShuffleProofDev:
        """Batch-first prove. B > fuse_b_max: the ~20-stage dispatch sequence
        (throughput mode — dispatch cost amortizes over the batch). B <=
        fuse_b_max (config, MPTPU_FUSE_B): the WHOLE flow runs as ONE fused
        XLA program — at B=1 the staged path pays ~15 sequential 25-40 ms
        dispatch latencies through the device relay, which the fused program
        collapses into a single dispatch (round-5 latency mode)."""
        from ..config import get_config

        B = pi.shape[0]
        if 0 < B <= get_config().fuse_b_max:
            return self._fused("fused_prove", self._prove_flow)(
                keys, deck_in, deck_out, pi, rho_c, rand
            )
        return self._prove_flow(keys, deck_in, deck_out, pi, rho_c, rand)

    def _fused(self, name: str, flow):
        key = self._k(name)
        fn = _PROGS.get(key)
        if fn is None:
            jfn = jax.jit(flow)

            def run(*a, _jfn=jfn):
                _FUSING[0] = True
                try:
                    return _jfn(*a)  # first call traces the stage bodies inline
                finally:
                    _FUSING[0] = False

            fn = run
            _PROGS[key] = fn
        return fn

    def _prove_flow(
        self,
        keys: ShuffleKeys,
        deck_in: Ciphertexts,
        deck_out: Ciphertexts,
        pi: jnp.ndarray,
        rho_c: jnp.ndarray,
        rand: ShuffleRand,
    ) -> ShuffleProofDev:
        cv, m, n, fr = self.cv, self.m, self.n, self.fr

        st = self.p_stmt()(keys, deck_in, deck_out)

        a_c = self.p_make_a()(pi)
        c_a = self.p_commit(m)(keys, a_c, rand.r)
        st, x = self.p_abs_pts(m, 1)(st, c_a)

        b_c = self.p_make_b()(x, pi)
        c_b = self.p_commit(m)(keys, b_c, rand.s)
        st, y, z = self.p_abs_pts(m, 2)(st, c_b)

        dz_rows, t_m, b_vec_m, v_m, cpb_vec_c, prod_s_m = self.p_prod_prep()(
            x, y, z, pi, rand.r, rand.s, rand.prod_s
        )
        c_pb = self.p_commit(1)(keys, cpb_vec_c, rand.prod_s[:, None])
        st = self.p_abs_pts(1, 0)(st, c_pb)[0]

        B_m, s_B_m, mid_vecs_c, mid_rs_c = self.p_had_mids()(
            dz_rows, t_m, prod_s_m, rand.had_sB
        )
        if m > 2:
            c_mid = self.p_commit(m - 2)(keys, mid_vecs_c, mid_rs_c)
            st, hx, hy = self.p_abs_pts(m - 2, 2)(st, c_mid)
        else:
            c_mid = AffP(
                jnp.zeros((pi.shape[0], 0, cv.fq.L), jnp.uint32),
                jnp.zeros((pi.shape[0], 0, cv.fq.L), jnp.uint32),
                jnp.zeros((pi.shape[0], 0), bool),
            )
            st, hx, hy = self.p_abs_const(_NO_MID, 2)(st)

        A_rows, R_rows, B_rows, S_rows = self.p_had_prep()(
            hx, B_m, s_B_m, dz_rows, t_m
        )
        zvecs, zrs, A, Bv, R, S, t_full = self.p_zero_prep()(
            hy,
            A_rows,
            R_rows,
            B_rows,
            S_rows,
            rand.zero_a0,
            rand.zero_r0,
            rand.zero_bm1,
            rand.zero_sm1,
            rand.zero_t,
        )
        c_zero = self.p_commit(2 * m + 3)(keys, zvecs, zrs)
        st, zx = self.p_abs_pts(2 * m + 3, 1)(st, c_zero)
        za, zr, zb, zs, zt = self.p_zero_open()(zx, A, Bv, R, S, t_full)

        svecs, srs, bpart, d_m, delta_m = self.p_svp_prep()(
            b_vec_m, rand.svp_d, rand.svp_rd, rand.svp_delta, rand.svp_s1, rand.svp_sx
        )
        c_svp = self.p_commit(3)(keys, svecs, srs)
        st, svx = self.p_abs_pts(3, 1)(st, c_svp)
        sa, sr, sb, ss = self.p_svp_open()(
            svx, b_vec_m, prod_s_m, bpart, d_m, delta_m,
            rand.svp_rd, rand.svp_s1, rand.svp_sx,
        )

        e0a, e1a, mvecs, mrs, rows, r_full_m, b_k, s_k, tau_k = self.p_me_prep()(
            keys, deck_out, x, pi, rand.s, rho_c,
            rand.me_a0, rand.me_r0, rand.me_b, rand.me_s, rand.me_tau,
        )
        c_me = self.p_commit(1 + 2 * m)(keys, mvecs, mrs)
        st, mex = self.p_abs_me()(st, c_me, e0a, e1a)
        ma, mr, mb, ms, mtau = self.p_me_open()(mex, rows, r_full_m, b_k, s_k, tau_k)

        sl = lambda aff, i: AffP(aff.x[:, i], aff.y[:, i], aff.inf[:, i])
        rg = lambda aff, i, j: AffP(aff.x[:, i:j], aff.y[:, i:j], aff.inf[:, i:j])
        return ShuffleProofDev(
            c_a=c_a,
            c_b=c_b,
            product=ProductProofDev(
                c_b=sl(c_pb, 0),
                hadamard=HadamardProofDev(
                    c_B_mid=c_mid,
                    zero=ZeroProofDev(
                        c_a0=sl(c_zero, 0),
                        c_bm1=sl(c_zero, 1),
                        c_d=rg(c_zero, 2, 2 * m + 3),
                        a=za, r=zr, b=zb, s=zs, t=zt,
                    ),
                ),
                svp=SVPProofDev(
                    c_d=sl(c_svp, 0),
                    c_delta=sl(c_svp, 1),
                    c_Delta=sl(c_svp, 2),
                    a_tilde=sa, r_tilde=sr, b_tilde=sb, s_tilde=ss,
                ),
            ),
            multi_exp=MultiExpProofDev(
                c_a0=sl(c_me, 0),
                c_b=rg(c_me, 1, 1 + 2 * m),
                e0=e0a, e1=e1a,
                a=ma, r=mr, b=mb, s=ms, tau=mtau,
            ),
        )

    # ----------------------------------------------------------- verify flow
    def p_ver_prep(self):
        m, n, N, fr = self.m, self.n, self.N, self.fr

        def build():
            def run(x, y, z, hy, za, zr, zb, zs, zt, sa, sr, sb, ss, svx, ma, mr, mb, ms):
                B = x.shape[0]
                # v = prod(y*i + x^i - z)
                xpow = fr.powers(x, N)
                i_m = fr.to_mont(
                    jnp.broadcast_to(
                        jnp.asarray(fr.small_int_limbs(np.arange(1, N + 1))),
                        (B, N, fr.L),
                    )
                )
                zb_ = jnp.broadcast_to(z[:, None, :], xpow.shape)
                v_m = fr.prod_mod(
                    fr.sub(fr.add(fr.mont_mul(y[:, None, :], i_m), xpow), zb_), axis=1
                )
                # zero lhs_d value <a, b>_y
                ypow = fr.powers(hy, n)
                ab_y = fr.sum_mod(
                    fr.mont_mul(fr.mont_mul(fr.to_mont(za), fr.to_mont(zb)), ypow),
                    axis=1,
                )
                # svp e vector
                a_t = fr.to_mont(sa)
                b_t = fr.to_mont(sb)
                e = fr.sub(
                    fr.mont_mul(svx[:, None, :], b_t[:, 1:]),
                    fr.mont_mul(b_t[:, :-1], a_t[:, 1:]),
                )
                zpad = jnp.zeros((B, 1, fr.L), jnp.uint32)
                # 9 commit vectors
                minus1 = fr.from_mont(
                    fr.neg(jnp.broadcast_to(jnp.asarray(fr.one_mont), (B, n, fr.L)))
                )
                mz = fr.from_mont(
                    fr.neg(jnp.broadcast_to(z[:, None, :], (B, n, fr.L)))
                )
                zero_l = jnp.zeros((B, fr.L), jnp.uint32)
                vecs_c = jnp.stack(
                    [
                        za,
                        zb,
                        jnp.concatenate([fr.from_mont(ab_y)[:, None], jnp.zeros((B, n - 1, fr.L), jnp.uint32)], axis=1),
                        sa,
                        jnp.concatenate([fr.from_mont(e), zpad], axis=1),
                        ma,
                        jnp.concatenate([mb[:, None], jnp.zeros((B, n - 1, fr.L), jnp.uint32)], axis=1),
                        mz,
                        minus1,
                    ],
                    axis=1,
                )  # [B, 9, n, L]
                rs_c = jnp.stack(
                    [zr, zs, zt, sr, ss, mr, ms, zero_l, zero_l], axis=1
                )
                # scalar-side svp checks
                svp_flag = fr.eq(b_t[:, 0], a_t[:, 0]) & fr.eq(
                    b_t[:, -1], fr.mont_mul(svx, v_m)
                )
                return vecs_c, rs_c, svp_flag, v_m

            return run

        return _prog(self._k("ver_prep"), build)

    def p_combo(self, Q: int, P: int):
        cv = self.cv

        def build():
            def run(px, py, pz, coeffs_c):
                return msm_mod.msm(cv, PointP(px, py, pz), coeffs_c)

            return run

        return _prog(self._k("combo", Q, P), build)

    def p_coeffs(self):
        """All homomorphic-combo coefficient tensors (pure Fr algebra)."""
        m, fr = self.m, self.fr

        def build():
            def run(x, y, hx, zx, svx, mex, ma):
                B = x.shape[0]
                one = jnp.broadcast_to(jnp.asarray(fr.one_mont), (B, fr.L))
                hxi = fr.powers(hx, m + 1, start=0)  # [B, m+1, L]
                zxi = fr.powers(zx, 2 * m + 2, start=0)
                xj = fr.powers(mex, 2 * m, start=0)
                # me rhs_e scalars use the ME challenge: mex^(m-i) * a, i=1..m
                mexpow = fr.powers(mex, max(m, 1), start=0)  # mex^0..mex^(m-1)
                ma_m = fr.to_mont(ma)
                mescal = fr.mont_mul(
                    jnp.flip(mexpow[:, :m], axis=1)[..., None, :], ma_m[:, None]
                )  # [B, m, n, L] with row i-1 coeff mex^(m-i)
                return dict(
                    one=one,
                    y=y,
                    hxi=hxi,
                    zxi=zxi,
                    xj=xj,
                    mescal=fr.from_mont(mescal.reshape(B, -1, fr.L)),
                )

            return run

        return _prog(self._k("coeffs"), build)

    def p_flags(self):
        cv, m, fr = self.cv, self.m, self.fr

        def build():
            def run(keys, lhs_aff, rhs_pts, cipher_pts, mb_c, mtau_c, czm1_aff, cbm_aff, em0_aff, em1_aff, svp_flag):
                # lhs commits [B, 7]; rhs combos [B, 7] (projective)
                lhs = aff_to_proj(cv, lhs_aff)
                ok_pairs = cv.eq(lhs, rhs_pts)  # [B, 7]
                # cipher check: lhsE == blind + rhsPair; T == e_m
                t0, t1, le0, le1, rp0, rp1 = (
                    PointP(cipher_pts.x[:, i], cipher_pts.y[:, i], cipher_pts.z[:, i])
                    for i in range(6)
                )
                bl0 = fixed_mul(cv, keys.gen, mtau_c)
                bl1 = cv.add(
                    fixed_mul(cv, keys.sgen, mb_c), fixed_mul(cv, keys.pk, mtau_c)
                )
                ok_e = cv.eq(le0, cv.add(bl0, rp0)) & cv.eq(le1, cv.add(bl1, rp1))
                em0 = aff_to_proj(cv, em0_aff)
                em1 = aff_to_proj(cv, em1_aff)
                ok_em = cv.eq(em0, t0) & cv.eq(em1, t1)
                ok_idzero = cv.is_identity(aff_to_proj(cv, czm1_aff))
                ok_idme = cv.is_identity(aff_to_proj(cv, cbm_aff))

                had_ok = ok_pairs[:, 0] & ok_pairs[:, 1] & ok_pairs[:, 2] & ok_idzero
                svp_ok = ok_pairs[:, 3] & ok_pairs[:, 4] & svp_flag
                me_ok = (
                    ok_pairs[:, 5]
                    & ok_pairs[:, 6]
                    & ok_e
                    & ok_em
                    & ok_idme
                )
                checks = ShuffleChecks(had_ok, svp_ok, me_ok)
                if debug:
                    return checks, {
                        "pairs": ok_pairs, "e": ok_e, "em": ok_em,
                        "idzero": ok_idzero, "idme": ok_idme, "svp": svp_flag,
                    }
                return checks

            return run

        debug = DEBUG_FLAGS
        return _prog(self._k("flags", debug), build)

    def verify(
        self,
        keys: ShuffleKeys,
        deck_in: Ciphertexts,
        deck_out: Ciphertexts,
        proof: ShuffleProofDev,
    ) -> ShuffleChecks:
        """Batch-first verify; fuses into one program at B <= fuse_b_max
        (see `prove`)."""
        from ..config import get_config

        B = proof.c_a.x.shape[0]
        if 0 < B <= get_config().fuse_b_max:
            return self._fused("fused_verify", self._verify_flow)(
                keys, deck_in, deck_out, proof
            )
        return self._verify_flow(keys, deck_in, deck_out, proof)

    def _verify_flow(
        self,
        keys: ShuffleKeys,
        deck_in: Ciphertexts,
        deck_out: Ciphertexts,
        proof: ShuffleProofDev,
    ) -> ShuffleChecks:
        cv, m, n, N, fr = self.cv, self.m, self.n, self.N, self.fr
        B = proof.c_a.x.shape[0]
        L = fr.L
        fqL = cv.fq.L
        zero_pt = proof.c_a  # any aff for identity padding shape

        # ---- transcript replay
        st = self.p_stmt()(keys, deck_in, deck_out)
        st, x = self.p_abs_pts(m, 1)(st, proof.c_a)
        st, y, z = self.p_abs_pts(m, 2)(st, proof.c_b)
        pb = proof.product.c_b
        st = self.p_abs_pts(1, 0)(
            st, AffP(pb.x[:, None], pb.y[:, None], pb.inf[:, None])
        )[0]
        if m > 2:
            st, hx, hy = self.p_abs_pts(m - 2, 2)(st, proof.product.hadamard.c_B_mid)
        else:
            st, hx, hy = self.p_abs_const(_NO_MID, 2)(st)
        zproof = proof.product.hadamard.zero
        zgroup = cat_affs_batched(zproof.c_a0, zproof.c_bm1, zproof.c_d)
        st, zx = self.p_abs_pts(2 * m + 3, 1)(st, zgroup)
        sproof = proof.product.svp
        sgroup = cat_affs_batched(sproof.c_d, sproof.c_delta, sproof.c_Delta)
        st, svx = self.p_abs_pts(3, 1)(st, sgroup)
        me = proof.multi_exp
        megroup = cat_affs_batched(me.c_a0, me.c_b)
        st, mex = self.p_abs_me()(st, megroup, me.e0, me.e1)

        # ---- deferred algebra
        vecs_c, rs_c, svp_flag, v_m = self.p_ver_prep()(
            x, y, z, hy,
            zproof.a, zproof.r, zproof.b, zproof.s, zproof.t,
            sproof.a_tilde, sproof.r_tilde, sproof.b_tilde, sproof.s_tilde, svx,
            me.a, me.r, me.b, me.s,
        )
        lhs = self.p_commit(9)(keys, vecs_c, rs_c)  # [B, 9]
        c_mz = slice_aff(lhs, 7)
        c_minus1 = slice_aff(lhs, 8)
        lhs7 = AffP(lhs.x[:, :7], lhs.y[:, :7], lhs.inf[:, :7])

        co = self.p_coeffs()(x, y, hx, zx, svx, mex, me.a)
        one_c = fr.from_mont(co["one"])
        y_c = fr.from_mont(co["y"])
        hxi_c = fr.from_mont(co["hxi"])
        zxi_c = fr.from_mont(co["zxi"])
        xj_c = fr.from_mont(co["xj"])

        ca_p = aff_to_proj(cv, proof.c_a)
        cb_p = aff_to_proj(cv, proof.c_b)
        cpb_p = aff_to_proj(cv, pb)
        cmz_p = aff_to_proj(cv, c_mz)
        cm1_p = aff_to_proj(cv, c_minus1)
        mid_p = aff_to_proj(cv, proof.product.hadamard.c_B_mid)
        ca0z_p = aff_to_proj(cv, zproof.c_a0)
        cbm1_p = aff_to_proj(cv, zproof.c_bm1)
        cd_p = aff_to_proj(cv, zproof.c_d)
        sd_p = aff_to_proj(cv, sproof.c_d)
        sdel_p = aff_to_proj(cv, sproof.c_delta)
        sDel_p = aff_to_proj(cv, sproof.c_Delta)
        mea0_p = aff_to_proj(cv, me.c_a0)
        mecb_p = aff_to_proj(cv, me.c_b)
        e0_p = aff_to_proj(cv, me.e0)
        e1_p = aff_to_proj(cv, me.e1)

        def pad_combo(pts_list, coeff_list, Pmax):
            """one combo: lists of (PointP [B, L], coeff [B, L]) -> padded row."""
            k = len(pts_list)
            xs = jnp.stack([p.x for p in pts_list], axis=1)
            ys = jnp.stack([p.y for p in pts_list], axis=1)
            zs = jnp.stack([p.z for p in pts_list], axis=1)
            cs = jnp.stack(coeff_list, axis=1)
            if k < Pmax:
                padp = jnp.zeros((B, Pmax - k, fqL), jnp.uint32)
                padc = jnp.zeros((B, Pmax - k, L), jnp.uint32)
                xs = jnp.concatenate([xs, padp], 1)
                ys = jnp.concatenate([ys, padp], 1)
                zs = jnp.concatenate([zs, padp], 1)
                cs = jnp.concatenate([cs, padc], 1)
            return (xs, ys, zs, cs)

        def pt_at(P: PointP, i) -> PointP:
            return PointP(P.x[:, i], P.y[:, i], P.z[:, i])

        def run_combos(rows):
            """Each group pads its rows to the GROUP's max width (pow2 for
            compile-cache reuse) — padding everything to the deck width N
            cost the verifier ~7-17x wasted MSM work on the small groups."""
            Q = len(rows)
            px = jnp.stack([r[0] for r in rows], axis=1)
            py = jnp.stack([r[1] for r in rows], axis=1)
            pz = jnp.stack([r[2] for r in rows], axis=1)
            cs = jnp.stack([r[3] for r in rows], axis=1)
            out = self.p_combo(Q, px.shape[2])(px, py, pz, cs)
            return out  # PointP [B, Q]

        pow2 = lambda v: 1 if v <= 1 else 1 << (v - 1).bit_length()

        # Layer 1: product-argument statement commitments
        # c_d_pts[k] = y*c_a[k] + c_b[k] + c_mz
        P1 = 4
        l1_rows = [
            pad_combo(
                [pt_at(ca_p, k), pt_at(cb_p, k), cmz_p],
                [y_c, one_c, one_c],
                P1,
            )
            for k in range(m)
        ]
        l1 = run_combos(l1_rows)  # c_d_pts [B, m]

        # Layer 2: hadamard-reduced commitments
        # c_B list = [c_d_pts[0], mids..., c_pb]
        cB = [pt_at(l1, 0)] + [pt_at(mid_p, i) for i in range(max(m - 2, 0))] + [cpb_p]
        P2 = pow2(max(m - 1, 1))
        l2_rows = []
        for i in range(1, m):  # c_D_i = hx^i * c_B[i-1]
            l2_rows.append(pad_combo([cB[i - 1]], [hxi_c[:, i]], P2))
        l2_rows.append(  # c_Dsum = sum hx^i * c_B[i]
            pad_combo(
                [cB[i] for i in range(1, m)], [hxi_c[:, i] for i in range(1, m)], P2
            )
        )
        l2 = run_combos(l2_rows)  # [B, m]: c_D_1..c_D_{m-1}, c_Dsum

        # zero-argument statement rows
        c_a_z = [pt_at(l2, i) for i in range(m)]  # c_D_1.., c_Dsum
        c_b_z = [pt_at(l1, i) for i in range(1, m)] + [cm1_p]

        # Layer 3: the rhs of every lhs==rhs check
        P3 = pow2(2 * m + 1)
        l3_rows = [
            # zero rhs_a = sum zx^i [c_a0z, c_a_z...]
            pad_combo([ca0z_p] + c_a_z, [zxi_c[:, i] for i in range(m + 1)], P3),
            # zero rhs_b = sum zx^(m+1-j) over [c_b_z..., c_bm1]
            pad_combo(
                c_b_z + [cbm1_p],
                [zxi_c[:, m + 1 - j] for j in range(1, m + 2)],
                P3,
            ),
            # zero rhs_d = sum zx^k c_d[k]
            pad_combo(
                [pt_at(cd_p, k) for k in range(2 * m + 1)],
                [zxi_c[:, k] for k in range(2 * m + 1)],
                P3,
            ),
            # svp rhs1 = svx*c_pb + c_d
            pad_combo([cpb_p, sd_p], [fr.from_mont(svx), one_c], P3),
            # svp rhs2 = svx*c_Delta + c_delta
            pad_combo([sDel_p, sdel_p], [fr.from_mont(svx), one_c], P3),
            # me rhs_a = sum xj[0..m] [c_a0me, c_b(shuffle)...]
            pad_combo(
                [mea0_p] + [pt_at(cb_p, i) for i in range(m)],
                [xj_c[:, i] for i in range(m + 1)],
                P3,
            ),
            # me rhs_b = sum xj c_b_me
            pad_combo(
                [pt_at(mecb_p, k) for k in range(2 * m)],
                [xj_c[:, k] for k in range(2 * m)],
                P3,
            ),
        ]
        rhs = run_combos(l3_rows)  # [B, 7]

        # cipher combos, grouped by width: the N-wide deck rows (T and the
        # me rhs pair) and the 2m-wide blind rows (lhs_e)
        xpow_c = fr.from_mont(fr.powers(x, N))
        mescal = co["mescal"]  # [B, m*n, L]
        deck_rows = [
            pad_combo([pt_at(deck_in.c0, i) for i in range(N)], [xpow_c[:, i] for i in range(N)], N),
            pad_combo([pt_at(deck_in.c1, i) for i in range(N)], [xpow_c[:, i] for i in range(N)], N),
            pad_combo([pt_at(deck_out.c0, i) for i in range(N)], [mescal[:, i] for i in range(N)], N),
            pad_combo([pt_at(deck_out.c1, i) for i in range(N)], [mescal[:, i] for i in range(N)], N),
        ]
        Pe = pow2(2 * m)
        e_rows = [
            pad_combo([pt_at(e0_p, k) for k in range(2 * m)], [xj_c[:, k] for k in range(2 * m)], Pe),
            pad_combo([pt_at(e1_p, k) for k in range(2 * m)], [xj_c[:, k] for k in range(2 * m)], Pe),
        ]
        deckc = run_combos(deck_rows)  # [B, 4]: T0, T1, rP0, rP1
        ec = run_combos(e_rows)  # [B, 2]: lE0, lE1
        # reassemble in p_flags order: T0, T1, lE0, lE1, rP0, rP1
        cipher = PointP(
            jnp.concatenate([deckc.x[:, :2], ec.x, deckc.x[:, 2:]], axis=1),
            jnp.concatenate([deckc.y[:, :2], ec.y, deckc.y[:, 2:]], axis=1),
            jnp.concatenate([deckc.z[:, :2], ec.z, deckc.z[:, 2:]], axis=1),
        )

        return self.p_flags()(
            keys,
            lhs7,
            rhs,
            cipher,
            me.b,
            me.tau,
            slice_aff_b(zproof.c_d, m + 1),
            slice_aff_b(me.c_b, m),
            slice_aff_b(me.e0, m),
            slice_aff_b(me.e1, m),
            svp_flag,
        )


def cat_affs_batched(*affs: AffP) -> AffP:
    """Concatenate AffP groups along axis 1 ([B, k] each; [B]-scalars become
    [B, 1])."""
    parts = []
    for a in affs:
        if a.inf.ndim == 1:
            parts.append(AffP(a.x[:, None], a.y[:, None], a.inf[:, None]))
        else:
            parts.append(a)
    return AffP(
        jnp.concatenate([p.x for p in parts], 1),
        jnp.concatenate([p.y for p in parts], 1),
        jnp.concatenate([p.inf for p in parts], 1),
    )


def slice_aff(aff: AffP, i: int) -> AffP:
    return AffP(aff.x[:, i], aff.y[:, i], aff.inf[:, i])


slice_aff_b = slice_aff


_STAGED_CACHE: dict = {}


def get_staged(cv: Curve, m: int, n: int) -> StagedShuffle:
    key = (id(cv), m, n)
    s = _STAGED_CACHE.get(key)
    if s is None:
        s = StagedShuffle(cv, m, n)
        _STAGED_CACHE[key] = s
    return s
