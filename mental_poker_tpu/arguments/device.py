"""Device-resident Bayer-Groth shuffle argument stack.

The whole prove (and verify) compiles to ONE XLA program: Fiat-Shamir
transcript (crypto/transcript_jax), commitments, sub-argument algebra and the
multi-exponentiation MSMs all run on device with zero host round-trips.
Round 1's host-orchestrated stack (arguments/{zero,single_value_product,
hadamard,product,multi_exponentiation,shuffle}.py) performed ~72 device->host
syncs per proof, which dominated wall clock; it is kept as the cross-check
reference — tests/test_device_arguments.py proves old-prove/new-verify and
new-prove/old-verify interoperate, which pins byte-exact transcripts.

Protocol/math notes are in the host modules; this module mirrors their
absorb schedules byte-for-byte. Reference roles: E8-E10 of SURVEY §2.2
(`proof_essentials::zkp::arguments::shuffle`, use-sites
`src/discrete_log_cards/mod.rs:397-415,427-442`).

Conventions:
- Fr values flow in Montgomery form; proof scalars are emitted canonical.
- Proof points are emitted affine (`AffP`) — host conversion and transcript
  byte-building share one batched inversion per absorb group.
- `ShuffleKeys` (all per-game tables) is a jit ARGUMENT, so one compiled
  program per (curve, m, n) serves every game and session.
- Every function is shape-static in (m, n) and batch-free; batching a fleet
  of decks is `jax.vmap` over the deck/proof axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto import transcript_jax as dt
from ..crypto import serialize_jax as sj
from ..crypto.elgamal import Ciphertexts
from ..crypto.transcript import SHUFFLE_RNG_SEED
from ..ops import msm as msm_mod
from ..ops.curve import Curve, PointP
from ..ops.msm import fixed_msm, fixed_mul


class AffP(NamedTuple):
    """Affine points: x/y Montgomery limbs [..., L], inf bool [...]."""

    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


class ShuffleKeys(NamedTuple):
    """Per-game fixed-base tables (jit argument; see module docstring)."""

    gen: PointP  # ElGamal generator table [W, T, L]
    pk: PointP  # aggregate public key table [W, T, L]
    ckg: PointP  # Pedersen vector generators [n, W, T, L]
    ckh: PointP  # Pedersen blinding generator [W, T, L]
    sgen: PointP  # extra shuffle generator G' [W, T, L]


class ShuffleRand(NamedTuple):
    """Prover randomness, canonical limbs (host-sampled, device-consumed)."""

    r: jnp.ndarray  # [m, L]   c_a commit randomness
    s: jnp.ndarray  # [m, L]   c_b commit randomness
    prod_s: jnp.ndarray  # [L]  product-arg c_b commit randomness
    had_sB: jnp.ndarray  # [max(m-2,0), L]
    zero_a0: jnp.ndarray  # [n, L]
    zero_r0: jnp.ndarray  # [L]
    zero_bm1: jnp.ndarray  # [n, L]
    zero_sm1: jnp.ndarray  # [L]
    zero_t: jnp.ndarray  # [2m+1, L]
    svp_d: jnp.ndarray  # [n, L]
    svp_rd: jnp.ndarray  # [L]
    svp_delta: jnp.ndarray  # [n, L]
    svp_s1: jnp.ndarray  # [L]
    svp_sx: jnp.ndarray  # [L]
    me_a0: jnp.ndarray  # [n, L]
    me_r0: jnp.ndarray  # [L]
    me_b: jnp.ndarray  # [2m, L]
    me_s: jnp.ndarray  # [2m, L]
    me_tau: jnp.ndarray  # [2m, L]


class ZeroProofDev(NamedTuple):
    c_a0: AffP  # []
    c_bm1: AffP  # []
    c_d: AffP  # [2m+1]
    a: jnp.ndarray  # [n, L] canonical
    r: jnp.ndarray  # [L]
    b: jnp.ndarray  # [n, L]
    s: jnp.ndarray  # [L]
    t: jnp.ndarray  # [L]


class HadamardProofDev(NamedTuple):
    c_B_mid: AffP  # [m-2] (empty when m == 2)
    zero: ZeroProofDev


class SVPProofDev(NamedTuple):
    c_d: AffP
    c_delta: AffP
    c_Delta: AffP
    a_tilde: jnp.ndarray  # [n, L]
    r_tilde: jnp.ndarray  # [L]
    b_tilde: jnp.ndarray  # [n, L]
    s_tilde: jnp.ndarray  # [L]


class ProductProofDev(NamedTuple):
    c_b: AffP
    hadamard: HadamardProofDev
    svp: SVPProofDev


class MultiExpProofDev(NamedTuple):
    c_a0: AffP
    c_b: AffP  # [2m]
    e0: AffP  # [2m] ciphertext first components
    e1: AffP  # [2m]
    a: jnp.ndarray  # [n, L]
    r: jnp.ndarray  # [L]
    b: jnp.ndarray  # [L]
    s: jnp.ndarray  # [L]
    tau: jnp.ndarray  # [L]


class ShuffleProofDev(NamedTuple):
    c_a: AffP  # [m]
    c_b: AffP  # [m]
    product: ProductProofDev
    multi_exp: MultiExpProofDev


class ShuffleChecks(NamedTuple):
    """Per-sub-argument verification flags; the wrapper raises in the
    reference's observable order (Hadamard -> SVP -> MultiExp)."""

    hadamard: jnp.ndarray
    svp: jnp.ndarray
    multi_exp: jnp.ndarray


# ---------------------------------------------------------------------------
# small point/byte helpers
# ---------------------------------------------------------------------------


def to_aff(cv: Curve, P: PointP) -> AffP:
    x, y, inf = cv.to_affine(P)
    return AffP(x, y, inf)


def aff_to_proj(cv: Curve, a: AffP) -> PointP:
    return cv.from_affine(a.x, a.y, a.inf)


def aff_bytes(cv: Curve, a: AffP) -> jnp.ndarray:
    """ToBytes blob straight from affine coords (no inversion)."""
    f = cv.fq
    xb = sj.field_bytes(f, f.from_mont(a.x))
    yb = sj.field_bytes(f, f.from_mont(a.y))
    infb = a.inf[..., None].astype(jnp.uint8)
    return jnp.concatenate([xb, yb, infb], axis=-1)


def aff_blob(cv: Curve, a: AffP) -> jnp.ndarray:
    """Concatenated blob over the last point axis (points_bytes order)."""
    pb = aff_bytes(cv, a)
    if pb.ndim == 1:
        return pb
    return pb.reshape(pb.shape[:-2] + (pb.shape[-2] * pb.shape[-1],))


def cat_pts(*ps: PointP) -> PointP:
    """Concatenate PointP batches along axis 0 (scalars become length-1)."""
    parts = [
        PointP(*(q[None] if q.ndim == 1 else q for q in p)) for p in ps
    ]
    return PointP(
        jnp.concatenate([p.x for p in parts], 0),
        jnp.concatenate([p.y for p in parts], 0),
        jnp.concatenate([p.z for p in parts], 0),
    )


def cat_affs(*affs: AffP) -> AffP:
    parts = []
    for a in affs:
        if a.x.shape[0] == 0 and a.x.ndim >= 2:
            parts.append(a)
        elif a.inf.ndim == 0:
            parts.append(AffP(a.x[None], a.y[None], a.inf[None]))
        else:
            parts.append(a)
    return AffP(
        jnp.concatenate([p.x for p in parts], 0),
        jnp.concatenate([p.y for p in parts], 0),
        jnp.concatenate([p.inf for p in parts], 0),
    )


def table_base(table: PointP) -> PointP:
    """The base point behind a [W, T, L] window table (entry [0, 1])."""
    return PointP(table.x[0, 1], table.y[0, 1], table.z[0, 1])


def _commit_canon(cv: Curve, keys: ShuffleKeys, vec_c, r_c) -> PointP:
    """Pedersen commit of CANONICAL limb vectors [..., k<=n, L] (zero-padded
    to the key width) with canonical randomness [..., L]."""
    n = keys.ckg.x.shape[0]
    k = vec_c.shape[-2]
    if k < n:
        pad = jnp.zeros(vec_c.shape[:-2] + (n - k, vec_c.shape[-1]), vec_c.dtype)
        vec_c = jnp.concatenate([vec_c, pad], axis=-2)
    return cv.add(fixed_msm(cv, keys.ckg, vec_c), fixed_mul(cv, keys.ckh, r_c))


def _commit_mont(cv: Curve, keys: ShuffleKeys, vec_m, r_m) -> PointP:
    fr = cv.fr
    return _commit_canon(cv, keys, fr.from_mont(vec_m), fr.from_mont(r_m))


def _commit_scalars_mont(cv: Curve, keys: ShuffleKeys, vals_m, rs_m) -> PointP:
    """com_scalar batched: vals [..., L] -> vectors (v, 0, ..., 0)."""
    vec = vals_m[..., None, :]  # [..., 1, L]
    return _commit_mont(cv, keys, vec, rs_m)


def _absorb_affs(cv: Curve, st, aff: AffP):
    return dt.absorb(st, aff_blob(cv, aff))


def _bilinear(fr, a_m, b_m, ypow_m):
    """<a, b>_y = sum_j a_j b_j y^(j+1); ypow = [y^1..y^n] (all mont)."""
    return fr.dot_mod(fr.mont_mul(a_m, b_m), ypow_m)


def _weighted_sum_vecs(fr, coeffs_m, vecs_m):
    """sum_i coeffs[i] * vecs[i]: coeffs [k, L], vecs [k, n, L] -> [n, L]."""
    return fr.sum_mod(fr.mont_mul(vecs_m, coeffs_m[:, None, :]), axis=0)


def _pt_msm(cv: Curve, pts: PointP, coeffs_m) -> PointP:
    """sum_i coeffs[i] * pts[i] (coeffs mont [k, L], pts [k, L])."""
    return msm_mod.msm(cv, pts, cv.fr.from_mont(coeffs_m))


# ---------------------------------------------------------------------------
# Zero argument (BG §5.2) — see arguments/zero.py for the protocol
# ---------------------------------------------------------------------------


def zero_prove(cv, keys, st, a_rows_m, r_m, b_rows_m, s_m, y_m, rand: ShuffleRand):
    fr = cv.fr
    m, n = a_rows_m.shape[0], a_rows_m.shape[1]
    a0 = fr.to_mont(rand.zero_a0)
    r0 = fr.to_mont(rand.zero_r0)
    bm1 = fr.to_mont(rand.zero_bm1)
    sm1 = fr.to_mont(rand.zero_sm1)
    t = fr.to_mont(rand.zero_t)  # [2m+1, L]
    t = t.at[m + 1].set(jnp.zeros_like(t[0]))

    A = jnp.concatenate([a0[None], a_rows_m], 0)  # rows 0..m
    Bv = jnp.concatenate([b_rows_m, bm1[None]], 0)  # rows 1..m+1 (index j-1)
    R = jnp.concatenate([r0[None], r_m], 0)
    S = jnp.concatenate([s_m, sm1[None]], 0)

    ypow = fr.powers(y_m, n)  # y^1..y^n
    d = []
    for k in range(2 * m + 1):
        acc = None
        for i in range(0, m + 1):
            j = m + 1 + i - k
            if 1 <= j <= m + 1:
                term = _bilinear(fr, A[i], Bv[j - 1], ypow)
                acc = term if acc is None else fr.add(acc, term)
        d.append(acc if acc is not None else jnp.zeros_like(y_m))
    d = jnp.stack(d, 0)  # [2m+1, L]

    c_a0 = _commit_mont(cv, keys, a0[None, :, :], r0[None])
    c_bm1 = _commit_mont(cv, keys, bm1[None, :, :], sm1[None])
    c_d = _commit_scalars_mont(cv, keys, d, t)  # [2m+1]
    group = to_aff(cv, cat_pts(c_a0, c_bm1, c_d))
    st = _absorb_affs(cv, st, group)
    st, x_m = dt.sample_field(st, fr)

    xi = fr.powers(x_m, 2 * m + 2, start=0)  # x^0..x^(2m+1)
    a_open = _weighted_sum_vecs(fr, xi[: m + 1], A)
    r_open = fr.dot_mod(xi[: m + 1], R, axis=0)
    xi_rev = jnp.flip(xi[: m + 1], axis=0)  # x^(m+1-j) for j=1..m+1 -> x^m..x^0
    b_open = _weighted_sum_vecs(fr, xi_rev, Bv)
    s_open = fr.dot_mod(xi_rev, S, axis=0)
    t_open = fr.dot_mod(xi[: 2 * m + 1], t, axis=0)

    proof = ZeroProofDev(
        AffP(group.x[0], group.y[0], group.inf[0]),
        AffP(group.x[1], group.y[1], group.inf[1]),
        AffP(group.x[2:], group.y[2:], group.inf[2:]),
        fr.from_mont(a_open),
        fr.from_mont(r_open),
        fr.from_mont(b_open),
        fr.from_mont(s_open),
        fr.from_mont(t_open),
    )
    return proof, st


def zero_verify(cv, keys, st, proof: ZeroProofDev, c_a_pts: PointP, c_b_pts: PointP, y_m):
    fr = cv.fr
    m = c_a_pts.x.shape[0]
    n = proof.a.shape[0]
    group = cat_affs(proof.c_a0, proof.c_bm1, proof.c_d)
    st = _absorb_affs(cv, st, group)
    st, x_m = dt.sample_field(st, fr)
    xi = fr.powers(x_m, 2 * m + 2, start=0)

    a_m = fr.to_mont(proof.a)
    b_m = fr.to_mont(proof.b)
    c_a0_p = aff_to_proj(cv, proof.c_a0)
    c_bm1_p = aff_to_proj(cv, proof.c_bm1)
    c_d_p = aff_to_proj(cv, proof.c_d)

    lhs_a = _commit_canon(cv, keys, proof.a, proof.r)
    rhs_a = _pt_msm(cv, cat_pts(c_a0_p, c_a_pts), xi[: m + 1])
    lhs_b = _commit_canon(cv, keys, proof.b, proof.s)
    rhs_b = _pt_msm(cv, cat_pts(c_b_pts, c_bm1_p), jnp.flip(xi[: m + 1], 0))
    ypow = fr.powers(y_m, n)
    ab_y = _bilinear(fr, a_m, b_m, ypow)
    lhs_d = _commit_canon(cv, keys, fr.from_mont(ab_y)[None], proof.t)
    rhs_d = _pt_msm(cv, c_d_p, xi[: 2 * m + 1])

    ok = (
        cv.eq(lhs_a, rhs_a)
        & cv.eq(lhs_b, rhs_b)
        & cv.eq(lhs_d, rhs_d)
        & cv.is_identity(PointP(c_d_p.x[m + 1], c_d_p.y[m + 1], c_d_p.z[m + 1]))
    )
    return ok, st


# ---------------------------------------------------------------------------
# Single-value product argument (BG §5.3) — see single_value_product.py
# ---------------------------------------------------------------------------


def svp_prove(cv, keys, st, a_m, r_m, v_m, rand: ShuffleRand):
    fr = cv.fr
    n = a_m.shape[0]
    d = fr.to_mont(rand.svp_d)
    r_d = fr.to_mont(rand.svp_rd)
    delta = fr.to_mont(rand.svp_delta)
    s1 = fr.to_mont(rand.svp_s1)
    sx = fr.to_mont(rand.svp_sx)
    delta = delta.at[0].set(d[0])
    delta = delta.at[n - 1].set(jnp.zeros_like(d[0]))

    b = jax.lax.associative_scan(fr.mont_mul, a_m, axis=0)  # partial products

    cdel_vec = fr.neg(fr.mont_mul(delta[:-1], d[1:]))  # [n-1]
    cDel_vec = fr.sub(
        fr.sub(delta[1:], fr.mont_mul(a_m[1:], delta[:-1])),
        fr.mont_mul(b[:-1], d[1:]),
    )  # [n-1]

    c_d = _commit_mont(cv, keys, d[None], r_d[None])
    c_delta = _commit_mont(cv, keys, cdel_vec[None], s1[None])
    c_Delta = _commit_mont(cv, keys, cDel_vec[None], sx[None])
    group = to_aff(cv, cat_pts(c_d, c_delta, c_Delta))
    st = _absorb_affs(cv, st, group)
    st, x_m = dt.sample_field(st, fr)

    a_t = fr.add(fr.mont_mul(x_m, a_m), d)
    r_t = fr.add(fr.mont_mul(x_m, r_m), r_d)
    b_t = fr.add(fr.mont_mul(x_m, b), delta)
    s_t = fr.add(fr.mont_mul(x_m, sx), s1)

    proof = SVPProofDev(
        AffP(group.x[0], group.y[0], group.inf[0]),
        AffP(group.x[1], group.y[1], group.inf[1]),
        AffP(group.x[2], group.y[2], group.inf[2]),
        fr.from_mont(a_t),
        fr.from_mont(r_t),
        fr.from_mont(b_t),
        fr.from_mont(s_t),
    )
    return proof, st


def svp_verify(cv, keys, st, proof: SVPProofDev, c_a_pt: PointP, v_m):
    fr = cv.fr
    group = cat_affs(proof.c_d, proof.c_delta, proof.c_Delta)
    st = _absorb_affs(cv, st, group)
    st, x_m = dt.sample_field(st, fr)

    a_t = fr.to_mont(proof.a_tilde)
    b_t = fr.to_mont(proof.b_tilde)
    c_d_p = aff_to_proj(cv, proof.c_d)
    c_delta_p = aff_to_proj(cv, proof.c_delta)
    c_Delta_p = aff_to_proj(cv, proof.c_Delta)

    lhs1 = _commit_canon(cv, keys, proof.a_tilde, proof.r_tilde)
    one_m = jnp.asarray(fr.one_mont)
    rhs1 = _pt_msm(cv, cat_pts(c_a_pt, c_d_p), jnp.stack([x_m, one_m], 0))
    e = fr.sub(fr.mont_mul(x_m, b_t[1:]), fr.mont_mul(b_t[:-1], a_t[1:]))
    lhs2 = _commit_canon(cv, keys, fr.from_mont(e), proof.s_tilde)
    rhs2 = _pt_msm(cv, cat_pts(c_Delta_p, c_delta_p), jnp.stack([x_m, one_m], 0))

    ok = (
        cv.eq(lhs1, rhs1)
        & cv.eq(lhs2, rhs2)
        & fr.eq(b_t[0], a_t[0])
        & fr.eq(b_t[-1], fr.mont_mul(x_m, v_m))
    )
    return ok, st


# ---------------------------------------------------------------------------
# Hadamard product argument (BG §5.1) — see hadamard.py
# ---------------------------------------------------------------------------

_NO_MID = b"hadamard:no-mid"


def hadamard_prove(cv, keys, st, a_rows_m, r_m, b_m, s_m, rand: ShuffleRand):
    fr = cv.fr
    m, n = a_rows_m.shape[0], a_rows_m.shape[1]
    B = jax.lax.associative_scan(fr.mont_mul, a_rows_m, axis=0)  # [m, n, L]

    s_B = jnp.concatenate(
        [r_m[0][None], fr.to_mont(rand.had_sB), s_m[None]], 0
    )  # [m, L]
    if m > 2:
        c_B_mid = _commit_mont(cv, keys, B[1:-1], s_B[1:-1])  # [m-2]
        mid_aff = to_aff(cv, c_B_mid)
        st = _absorb_affs(cv, st, mid_aff)
    else:
        mid_aff = AffP(
            jnp.zeros((0, cv.fq.L), jnp.uint32),
            jnp.zeros((0, cv.fq.L), jnp.uint32),
            jnp.zeros((0,), bool),
        )
        st = dt.absorb(st, sj.const_bytes(_NO_MID))
    st, x_m = dt.sample_field(st, fr)
    st, y_m = dt.sample_field(st, fr)

    xi = fr.powers(x_m, m + 1, start=0)  # x^0..x^m
    d_rows = fr.mont_mul(B[: m - 1], xi[1:m][:, None, :])  # x^i B_i, i=1..m-1
    d_sum = _weighted_sum_vecs(fr, xi[1:m], B[1:m])
    t_sum = fr.dot_mod(xi[1:m], s_B[1:m], axis=0)
    a_rows_z = jnp.concatenate([d_rows, d_sum[None]], 0)  # [m, n, L]
    r_rows_z = jnp.concatenate(
        [fr.mont_mul(xi[1:m], s_B[: m - 1]), t_sum[None]], 0
    )  # [m, L]
    minus1 = fr.neg(jnp.broadcast_to(jnp.asarray(fr.one_mont), (n, fr.L)))
    b_rows_z = jnp.concatenate([a_rows_m[1:], minus1[None]], 0)
    s_rows_z = jnp.concatenate([r_m[1:], jnp.zeros((1, fr.L), jnp.uint32)], 0)

    zp, st = zero_prove(cv, keys, st, a_rows_z, r_rows_z, b_rows_z, s_rows_z, y_m, rand)
    return HadamardProofDev(mid_aff, zp), st


def hadamard_verify(cv, keys, st, proof: HadamardProofDev, c_a_pts: PointP, c_b_pt: PointP):
    fr = cv.fr
    m = c_a_pts.x.shape[0]
    n = keys.ckg.x.shape[0]
    if proof.c_B_mid.x.shape[0] > 0:
        st = _absorb_affs(cv, st, proof.c_B_mid)
    else:
        st = dt.absorb(st, sj.const_bytes(_NO_MID))
    st, x_m = dt.sample_field(st, fr)
    st, y_m = dt.sample_field(st, fr)

    xi = fr.powers(x_m, m + 1, start=0)
    c_B = cat_pts(
        PointP(c_a_pts.x[0], c_a_pts.y[0], c_a_pts.z[0]),
        aff_to_proj(cv, proof.c_B_mid),
        c_b_pt,
    )  # [m]
    # c_D[i] = x^i * c_B[i-1], i = 1..m-1
    xi_c = fr.from_mont(xi[1:m])  # [m-1, L]
    c_D = cv.scalar_mul(xi_c, PointP(c_B.x[: m - 1], c_B.y[: m - 1], c_B.z[: m - 1]))
    c_Dsum = _pt_msm(cv, PointP(c_B.x[1:m], c_B.y[1:m], c_B.z[1:m]), xi[1:m])
    minus1 = fr.neg(jnp.broadcast_to(jnp.asarray(fr.one_mont), (n, fr.L)))
    c_minus1 = _commit_mont(
        cv, keys, minus1[None], jnp.zeros((1, fr.L), jnp.uint32)[0][None]
    )
    c_a_z = cat_pts(c_D, c_Dsum)
    c_b_z = cat_pts(
        PointP(c_a_pts.x[1:], c_a_pts.y[1:], c_a_pts.z[1:]), c_minus1
    )
    return zero_verify(cv, keys, st, proof.zero, c_a_z, c_b_z, y_m)


# ---------------------------------------------------------------------------
# Product argument (BG §5) — see product.py
# ---------------------------------------------------------------------------


def product_prove(cv, keys, st, rows_m, t_m, v_m, rand: ShuffleRand):
    fr = cv.fr
    b_vec = fr.prod_mod(rows_m, axis=0)  # entrywise row product [n, L]
    prod_s = fr.to_mont(rand.prod_s)
    c_pb = _commit_mont(cv, keys, b_vec[None], prod_s[None])
    pb_aff = to_aff(cv, c_pb)
    st = _absorb_affs(cv, st, pb_aff)
    hp, st = hadamard_prove(cv, keys, st, rows_m, t_m, b_vec, prod_s, rand)
    sp, st = svp_prove(cv, keys, st, b_vec, prod_s, v_m, rand)
    return (
        ProductProofDev(AffP(pb_aff.x[0], pb_aff.y[0], pb_aff.inf[0]), hp, sp),
        st,
    )


def product_verify(cv, keys, st, proof: ProductProofDev, c_a_pts: PointP, v_m):
    st = _absorb_affs(cv, st, AffP(proof.c_b.x[None], proof.c_b.y[None], proof.c_b.inf[None]))
    c_pb = aff_to_proj(cv, proof.c_b)
    had_ok, st = hadamard_verify(cv, keys, st, proof.hadamard, c_a_pts, c_pb)
    svp_ok, st = svp_verify(cv, keys, st, proof.svp, c_pb, v_m)
    return had_ok, svp_ok, st


# ---------------------------------------------------------------------------
# Multi-exponentiation argument (BG §4) — see multi_exponentiation.py
# ---------------------------------------------------------------------------


def _cipher_rows_msm(cv, C: Ciphertexts, row_ids, scalars_c) -> Ciphertexts:
    """MSM over selected [m, n] ciphertext-matrix rows (static row_ids) with
    canonical scalars [len(row_ids)*n, L]."""
    idx = np.asarray(row_ids, dtype=np.int32)
    L = C.c0.x.shape[-1]

    def sel(P: PointP) -> PointP:
        return PointP(
            P.x[idx].reshape(-1, L), P.y[idx].reshape(-1, L), P.z[idx].reshape(-1, L)
        )

    return Ciphertexts(
        msm_mod.msm(cv, sel(C.c0), scalars_c), msm_mod.msm(cv, sel(C.c1), scalars_c)
    )


def _enc_blind(cv, keys, b_m, tau_m) -> Ciphertexts:
    """E(b*G'; tau) = (tau*g, b*G' + tau*pk), batched over leading dims."""
    fr = cv.fr
    tau_c = fr.from_mont(tau_m)
    b_c = fr.from_mont(b_m)
    c0 = fixed_mul(cv, keys.gen, tau_c)
    c1 = cv.add(fixed_mul(cv, keys.sgen, b_c), fixed_mul(cv, keys.pk, tau_c))
    return Ciphertexts(c0, c1)


def me_prove(cv, keys, st, C: Ciphertexts, a_rows_m, r_m, rho_m, rand: ShuffleRand):
    """C: [m, n] ciphertext matrix; a_rows (the exponent rows A_1..A_m) mont;
    r their commit randomness; rho the aggregate masking factor."""
    fr = cv.fr
    m, n = a_rows_m.shape[0], a_rows_m.shape[1]
    a0 = fr.to_mont(rand.me_a0)
    r0 = fr.to_mont(rand.me_r0)
    b_k = fr.to_mont(rand.me_b)  # [2m, L]
    s_k = fr.to_mont(rand.me_s)
    tau_k = fr.to_mont(rand.me_tau)
    zero = jnp.zeros((fr.L,), jnp.uint32)
    b_k = b_k.at[m].set(zero)
    s_k = s_k.at[m].set(zero)
    tau_k = tau_k.at[m].set(rho_m)

    rows = jnp.concatenate([a0[None], a_rows_m], 0)  # exponent rows 0..m

    blinds = _enc_blind(cv, keys, b_k, tau_k)  # [2m] ciphertexts
    # Diagonals D_k batched into ONE [2m]-leading MSM: every diagonal selects
    # at most m ciphertext rows; pad shorter selections with row 0 + zero
    # scalars (identity contribution) so shapes are uniform.
    zero_row = jnp.zeros((n, fr.L), jnp.uint32)
    sel_ids = np.zeros((2 * m, m), np.int32)
    sel_scal = []
    for k in range(2 * m):
        scal_rows = []
        slot = 0
        for i in range(1, m + 1):
            j = k - m + i
            if 0 <= j <= m:
                sel_ids[k, slot] = i - 1
                scal_rows.append(fr.from_mont(rows[j]))
                slot += 1
        while slot < m:
            scal_rows.append(zero_row)
            slot += 1
        sel_scal.append(jnp.concatenate(scal_rows, 0))
    scal = jnp.stack(sel_scal, 0)  # [2m, m*n, L]
    idx = jnp.asarray(sel_ids)  # [2m, m]
    L = C.c0.x.shape[-1]

    def gather_rows(P: PointP) -> PointP:
        # [m, n, L] rows -> [2m, m*n, L]
        return PointP(
            P.x[idx].reshape(2 * m, m * n, L),
            P.y[idx].reshape(2 * m, m * n, L),
            P.z[idx].reshape(2 * m, m * n, L),
        )

    d0 = msm_mod.msm(cv, gather_rows(C.c0), scal)  # [2m]
    d1 = msm_mod.msm(cv, gather_rows(C.c1), scal)
    e0 = cv.add(blinds.c0, d0)
    e1 = cv.add(blinds.c1, d1)

    c_a0 = _commit_mont(cv, keys, a0[None], r0[None])
    c_bs = _commit_scalars_mont(cv, keys, b_k, s_k)  # [2m]
    pts_aff = to_aff(cv, cat_pts(c_a0, c_bs))  # [1+2m]
    e0_aff = to_aff(cv, e0)
    e1_aff = to_aff(cv, e1)
    e_bytes = jnp.concatenate([aff_bytes(cv, e0_aff), aff_bytes(cv, e1_aff)], axis=-1)
    e_blob = e_bytes.reshape((e_bytes.shape[0] * e_bytes.shape[1],))
    st = dt.absorb(st, sj.concat_bytes(aff_blob(cv, pts_aff), e_blob))
    st, x_m = dt.sample_field(st, fr)

    xj = fr.powers(x_m, 2 * m, start=0)  # x^0..x^(2m-1)
    a_open = _weighted_sum_vecs(fr, xj[: m + 1], rows)
    r_open = fr.dot_mod(xj[: m + 1], jnp.concatenate([r0[None], r_m], 0), axis=0)
    b_open = fr.dot_mod(xj, b_k, axis=0)
    s_open = fr.dot_mod(xj, s_k, axis=0)
    tau_open = fr.dot_mod(xj, tau_k, axis=0)

    proof = MultiExpProofDev(
        AffP(pts_aff.x[0], pts_aff.y[0], pts_aff.inf[0]),
        AffP(pts_aff.x[1:], pts_aff.y[1:], pts_aff.inf[1:]),
        e0_aff,
        e1_aff,
        fr.from_mont(a_open),
        fr.from_mont(r_open),
        fr.from_mont(b_open),
        fr.from_mont(s_open),
        fr.from_mont(tau_open),
    )
    return proof, st


def me_verify(cv, keys, st, proof: MultiExpProofDev, C: Ciphertexts, T: Ciphertexts, c_a_pts: PointP):
    fr = cv.fr
    m = c_a_pts.x.shape[0]
    pts_aff = cat_affs(proof.c_a0, proof.c_b)
    e_bytes = jnp.concatenate(
        [aff_bytes(cv, proof.e0), aff_bytes(cv, proof.e1)], axis=-1
    )
    e_blob = e_bytes.reshape((e_bytes.shape[0] * e_bytes.shape[1],))
    st = dt.absorb(st, sj.concat_bytes(aff_blob(cv, pts_aff), e_blob))
    st, x_m = dt.sample_field(st, fr)
    xj = fr.powers(x_m, 2 * m, start=0)

    e0_p = aff_to_proj(cv, proof.e0)
    e1_p = aff_to_proj(cv, proof.e1)
    c_b_p = aff_to_proj(cv, proof.c_b)

    ok_em = cv.eq(PointP(e0_p.x[m], e0_p.y[m], e0_p.z[m]), T.c0) & cv.eq(
        PointP(e1_p.x[m], e1_p.y[m], e1_p.z[m]), T.c1
    )
    ok_cbm = cv.is_identity(PointP(c_b_p.x[m], c_b_p.y[m], c_b_p.z[m]))

    lhs_a = _commit_canon(cv, keys, proof.a, proof.r)
    rhs_a = _pt_msm(cv, cat_pts(aff_to_proj(cv, proof.c_a0), c_a_pts), xj[: m + 1])
    ok_a = cv.eq(lhs_a, rhs_a)

    lhs_b = _commit_canon(cv, keys, proof.a[:1].at[0].set(proof.b), proof.s)
    rhs_b = _pt_msm(cv, c_b_p, xj)
    ok_b = cv.eq(lhs_b, rhs_b)

    # sum_k x^k E_k == E(b*G'; tau) + sum_i x^(m-i) <a, C_i>
    xj_c = fr.from_mont(xj)
    lhs_e = Ciphertexts(
        msm_mod.msm(cv, e0_p, xj_c), msm_mod.msm(cv, e1_p, xj_c)
    )
    blind = _enc_blind(cv, keys, fr.to_mont(proof.b), fr.to_mont(proof.tau))
    a_m = fr.to_mont(proof.a)
    scal_rows = [
        fr.mont_mul(xj[m - i], a_m) for i in range(1, m + 1)
    ]  # x^(m-i) * a
    scal = fr.from_mont(jnp.concatenate(scal_rows, 0))
    rhs_pair = _cipher_rows_msm(cv, C, list(range(m)), scal)
    rhs_e = Ciphertexts(cv.add(blind.c0, rhs_pair.c0), cv.add(blind.c1, rhs_pair.c1))
    ok_e = cv.eq(lhs_e.c0, rhs_e.c0) & cv.eq(lhs_e.c1, rhs_e.c1)

    return ok_em & ok_cbm & ok_a & ok_b & ok_e, st


# ---------------------------------------------------------------------------
# Shuffle argument (top level) — see shuffle.py
# ---------------------------------------------------------------------------


def _statement_blob(cv, keys, deck_in: Ciphertexts, deck_out: Ciphertexts, m: int, n: int):
    pk_pt = table_base(keys.pk)
    return sj.concat_bytes(
        sj.points_blob(cv, pk_pt),
        sj.cipher_blob(cv, deck_in.c0, deck_in.c1),
        sj.cipher_blob(cv, deck_out.c0, deck_out.c1),
        sj.u64_le_bytes(m),
        sj.u64_le_bytes(n),
    )


def _as_matrix(cts: Ciphertexts, m: int, n: int) -> Ciphertexts:
    def rs(P: PointP) -> PointP:
        L = P.x.shape[-1]
        return PointP(
            P.x.reshape(m, n, L), P.y.reshape(m, n, L), P.z.reshape(m, n, L)
        )

    return Ciphertexts(rs(cts.c0), rs(cts.c1))


def shuffle_prove(
    cv: Curve,
    m: int,
    n: int,
    keys: ShuffleKeys,
    deck_in: Ciphertexts,
    deck_out: Ciphertexts,
    pi: jnp.ndarray,  # int32 [N]
    rho_c: jnp.ndarray,  # canonical limbs [N, L]
    rand: ShuffleRand,
) -> ShuffleProofDev:
    fr = cv.fr
    N = m * n
    st = dt.init(SHUFFLE_RNG_SEED)
    st = dt.absorb(st, _statement_blob(cv, keys, deck_in, deck_out, m, n))

    # a_i = pi(i) + 1 (canonical; N < 2^16 so a single limb suffices)
    a_c = jnp.zeros((N, fr.L), jnp.uint32).at[:, 0].set(pi.astype(jnp.uint32) + 1)
    a_m = fr.to_mont(a_c)
    r_m = fr.to_mont(rand.r)
    s_m = fr.to_mont(rand.s)
    c_a = _commit_canon(cv, keys, a_c.reshape(m, n, fr.L), rand.r)
    c_a_aff = to_aff(cv, c_a)
    st = _absorb_affs(cv, st, c_a_aff)
    st, x_m = dt.sample_field(st, fr)

    xpow = fr.powers(x_m, N)  # [N, L] = x^1..x^N
    b_m = xpow[pi]  # b_i = x^(pi(i)+1)
    b_c = fr.from_mont(b_m)
    c_b = _commit_canon(cv, keys, b_c.reshape(m, n, fr.L), rand.s)
    c_b_aff = to_aff(cv, c_b)
    st = _absorb_affs(cv, st, c_b_aff)
    st, y_m = dt.sample_field(st, fr)
    st, z_m = dt.sample_field(st, fr)

    # product argument over d - z = y*a + b - z
    dz_m = fr.sub(fr.add(fr.mont_mul(y_m, a_m), b_m), jnp.broadcast_to(z_m, b_m.shape))
    t_m = fr.add(fr.mont_mul(y_m, r_m), s_m)  # [m, L]
    i_m = fr.to_mont(jnp.asarray(fr.small_int_limbs(np.arange(1, N + 1))))
    terms = fr.sub(
        fr.add(fr.mont_mul(y_m, i_m), xpow), jnp.broadcast_to(z_m, i_m.shape)
    )
    v_m = fr.prod_mod(terms, axis=0)
    prod_proof, st = product_prove(
        cv, keys, st, dz_m.reshape(m, n, fr.L), t_m, v_m, rand
    )

    # multi-exponentiation argument
    rho_m = fr.to_mont(rho_c)
    rho_star = fr.neg(fr.dot_mod(rho_m, b_m, axis=0))
    me_proof, st = me_prove(
        cv,
        keys,
        st,
        _as_matrix(deck_out, m, n),
        b_m.reshape(m, n, fr.L),
        s_m,
        rho_star,
        rand,
    )
    return ShuffleProofDev(c_a_aff, c_b_aff, prod_proof, me_proof)


def shuffle_verify(
    cv: Curve,
    m: int,
    n: int,
    keys: ShuffleKeys,
    deck_in: Ciphertexts,
    deck_out: Ciphertexts,
    proof: ShuffleProofDev,
) -> ShuffleChecks:
    fr = cv.fr
    N = m * n
    st = dt.init(SHUFFLE_RNG_SEED)
    st = dt.absorb(st, _statement_blob(cv, keys, deck_in, deck_out, m, n))
    st = _absorb_affs(cv, st, proof.c_a)
    st, x_m = dt.sample_field(st, fr)
    st = _absorb_affs(cv, st, proof.c_b)
    st, y_m = dt.sample_field(st, fr)
    st, z_m = dt.sample_field(st, fr)

    c_a_pts = aff_to_proj(cv, proof.c_a)
    c_b_pts = aff_to_proj(cv, proof.c_b)

    # c_D[k] = y*c_A[k] + c_B[k] + com(-z, ..., -z; 0)
    minus_z = fr.neg(z_m)
    c_mz = _commit_mont(
        cv,
        keys,
        jnp.broadcast_to(minus_z, (1, n, fr.L)),
        jnp.zeros((1, fr.L), jnp.uint32),
    )
    y_c = fr.from_mont(y_m)
    yA = cv.scalar_mul(jnp.broadcast_to(y_c, (m, fr.L)), c_a_pts)
    c_d_pts = cv.add(cv.add(yA, c_b_pts), PointP(*(jnp.broadcast_to(q, yA.x.shape) for q in c_mz)))

    xpow = fr.powers(x_m, N)
    i_m = fr.to_mont(jnp.asarray(fr.small_int_limbs(np.arange(1, N + 1))))
    terms = fr.sub(
        fr.add(fr.mont_mul(y_m, i_m), xpow), jnp.broadcast_to(z_m, i_m.shape)
    )
    v_m = fr.prod_mod(terms, axis=0)

    had_ok, svp_ok, st = product_verify(cv, keys, st, proof.product, c_d_pts, v_m)

    # T = sum_i x^i * deck_in_i
    xpow_c = fr.from_mont(xpow)
    T = Ciphertexts(
        msm_mod.msm(cv, deck_in.c0, xpow_c), msm_mod.msm(cv, deck_in.c1, xpow_c)
    )
    me_ok, st = me_verify(
        cv, keys, st, proof.multi_exp, _as_matrix(deck_out, m, n), T, c_b_pts
    )
    return ShuffleChecks(had_ok, svp_ok, me_ok)
