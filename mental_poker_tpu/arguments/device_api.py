"""Host-facing wrapper for the device-resident shuffle argument.

Bridges the protocol layer (host points / Python-int proofs, GameRng) and the
single-program device prover/verifier in arguments/device.py:

- samples the prover's randomness bundle on host (GameRng) as limb arrays;
- assembles the per-game `ShuffleKeys` table pytree (cached on the params);
- caches one jitted prove/verify per (curve, m, n);
- converts the device proof pytree <-> the host dataclass `ShuffleProof`
  (same shape as round 1, so proof_io serialization and the host-orchestrated
  stack interoperate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.errors import (
    HADAMARD,
    MULTI_EXP,
    SVP_ARG,
    ProofVerificationError,
)
from ..ops.curve import Curve
from ..ops.field import limbs_to_int
from ..ops.msm import FixedBaseTable
from ..utils.rand import GameRng, ints_to_limbs
from . import device as dev
from . import hadamard as had_mod
from . import multi_exponentiation as me_mod
from . import product as product_mod
from . import shuffle as shuffle_mod
from . import single_value_product as svp_mod
from . import zero as zero_mod


def sample_shuffle_rand(
    rng: GameRng, m: int, n: int, L: int, order: int, batch: int = 1
) -> dev.ShuffleRand:
    """Draw the prover randomness bundle (documented draw order), with a
    leading [batch] proof axis on every leaf. Vectorized host sampling
    (`GameRng.scalar_limbs`): one numpy draw per leaf, not B*k Python ints."""

    def vec(k):
        if k == 0:
            return np.zeros((batch, 0, L), np.uint32)
        return rng.scalar_limbs(order, (batch, k), L)

    def one():
        return rng.scalar_limbs(order, (batch,), L)

    return dev.ShuffleRand(
        r=vec(m),
        s=vec(m),
        prod_s=one(),
        had_sB=vec(max(m - 2, 0)),
        zero_a0=vec(n),
        zero_r0=one(),
        zero_bm1=vec(n),
        zero_sm1=one(),
        zero_t=vec(2 * m + 1),
        svp_d=vec(n),
        svp_rd=one(),
        svp_delta=vec(n),
        svp_s1=one(),
        svp_sx=one(),
        me_a0=vec(n),
        me_r0=one(),
        me_b=vec(2 * m),
        me_s=vec(2 * m),
        me_tau=vec(2 * m),
    )


def make_keys(pp, shared_key) -> dev.ShuffleKeys:
    """Per-(game, aggregate-key) table pytree; cached on the parameters."""
    cache = getattr(pp, "_dev_keys_cache", None)
    if cache is None:
        cache = {}
        pp._dev_keys_cache = cache
    ck = cache.get(id(shared_key))
    if ck is not None:
        return ck
    if not hasattr(pp, "_shuffle_gen_table"):
        pp._shuffle_gen_table = FixedBaseTable(pp.cv, pp.shuffle_generator)
    keys = dev.ShuffleKeys(
        gen=pp.enc.gen_table.table,
        pk=shared_key.table.table,
        ckg=pp.commit_key.g_msm.table,
        ckh=pp.commit_key.h_table.table,
        sgen=pp._shuffle_gen_table.table,
    )
    cache[id(shared_key)] = keys
    return keys


def prove_shuffle(cv: Curve, m: int, n: int, keys, deck_in, deck_out, pi, rho_c, rand):
    """Batch-first device prove (staged programs). deck_*: [B, N] ciphertexts,
    pi int32 [B, N], rho_c [B, N, L], rand leaves [B, ...]."""
    from .staged import get_staged

    return get_staged(cv, m, n).prove(keys, deck_in, deck_out, pi, rho_c, rand)


def verify_shuffle(cv: Curve, m: int, n: int, keys, deck_in, deck_out, proof):
    """Batch-first device verify -> ShuffleChecks flags [B]."""
    from .staged import get_staged

    return get_staged(cv, m, n).verify(keys, deck_in, deck_out, proof)


def raise_by_flags(checks: dev.ShuffleChecks) -> None:
    """Raise the reference-ordered error for the first failing sub-check
    (Hadamard (5.1) -> SVP (5.3) -> MultiExp (4.1)), matching
    `tests.rs:213-226`'s observable failure order."""
    if not bool(np.asarray(jax.device_get(checks.hadamard)).all()):
        raise ProofVerificationError(HADAMARD)
    if not bool(np.asarray(jax.device_get(checks.svp)).all()):
        raise ProofVerificationError(SVP_ARG)
    if not bool(np.asarray(jax.device_get(checks.multi_exp)).all()):
        raise ProofVerificationError(MULTI_EXP)


# ---------------------------------------------------------------------------
# device proof <-> host dataclass conversion
# ---------------------------------------------------------------------------


def _aff_to_hosts(cv: Curve, a: dev.AffP) -> list:
    f = cv.fq
    xs = np.asarray(jax.device_get(a.x))
    ys = np.asarray(jax.device_get(a.y))
    infs = np.asarray(jax.device_get(a.inf))
    if xs.ndim == 1:
        xs, ys, infs = xs[None], ys[None], infs[None]
    out = []
    for x, y, i in zip(xs, ys, infs):
        if i:
            out.append(cv.host.identity)
        else:
            out.append((f.to_int(x), f.to_int(y), False))
    return out


def _hosts_to_aff(cv: Curve, pts, squeeze: bool = False) -> dev.AffP:
    f = cv.fq
    xs = np.stack([f.from_int(0 if p[2] else p[0]) for p in pts])
    ys = np.stack([f.from_int(1 if p[2] else p[1]) for p in pts])
    infs = np.array([bool(p[2]) for p in pts])
    if squeeze:
        return dev.AffP(jnp.asarray(xs[0]), jnp.asarray(ys[0]), jnp.asarray(infs[0]))
    return dev.AffP(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(infs))


def _limbs_to_ints(arr) -> list:
    a = np.asarray(jax.device_get(arr))
    if a.ndim == 1:
        return limbs_to_int(a)
    return [limbs_to_int(row) for row in a]


def _ints_to_limb_arr(vals, L: int, scalar: bool = False):
    arr = ints_to_limbs(list(np.atleast_1d(np.asarray(vals, dtype=object))), L)
    if scalar:
        return jnp.asarray(arr[0])
    return jnp.asarray(arr)


def squeeze_proof(p: dev.ShuffleProofDev) -> dev.ShuffleProofDev:
    """Drop the leading batch axis of a B == 1 proof."""
    return jax.tree.map(lambda a: a[0], p)


def expand_proof(p: dev.ShuffleProofDev) -> dev.ShuffleProofDev:
    """Add a leading batch axis (B == 1)."""
    return jax.tree.map(lambda a: a[None], p)


def dev_proof_to_host(cv: Curve, p: dev.ShuffleProofDev) -> shuffle_mod.ShuffleProof:
    if p.c_a.x.ndim == 3:  # batched: only B == 1 converts to a host proof
        assert p.c_a.x.shape[0] == 1, "host proofs are single-statement"
        p = squeeze_proof(p)
    zero = p.product.hadamard.zero
    svp = p.product.svp
    me = p.multi_exp
    e0 = _aff_to_hosts(cv, me.e0)
    e1 = _aff_to_hosts(cv, me.e1)
    return shuffle_mod.ShuffleProof(
        c_a=_aff_to_hosts(cv, p.c_a),
        c_b=_aff_to_hosts(cv, p.c_b),
        product=product_mod.ProductProof(
            c_b=_aff_to_hosts(cv, p.product.c_b)[0],
            hadamard=had_mod.HadamardProof(
                c_B_mid=_aff_to_hosts(cv, p.product.hadamard.c_B_mid)
                if p.product.hadamard.c_B_mid.x.shape[0]
                else [],
                zero=zero_mod.ZeroProof(
                    c_a0=_aff_to_hosts(cv, zero.c_a0)[0],
                    c_bm1=_aff_to_hosts(cv, zero.c_bm1)[0],
                    c_d=_aff_to_hosts(cv, zero.c_d),
                    a=_limbs_to_ints(zero.a),
                    r=_limbs_to_ints(zero.r),
                    b=_limbs_to_ints(zero.b),
                    s=_limbs_to_ints(zero.s),
                    t=_limbs_to_ints(zero.t),
                ),
            ),
            svp=svp_mod.SVPProof(
                c_d=_aff_to_hosts(cv, svp.c_d)[0],
                c_delta=_aff_to_hosts(cv, svp.c_delta)[0],
                c_Delta=_aff_to_hosts(cv, svp.c_Delta)[0],
                a_tilde=_limbs_to_ints(svp.a_tilde),
                r_tilde=_limbs_to_ints(svp.r_tilde),
                b_tilde=_limbs_to_ints(svp.b_tilde),
                s_tilde=_limbs_to_ints(svp.s_tilde),
            ),
        ),
        multi_exp=me_mod.MultiExpProof(
            c_a0=_aff_to_hosts(cv, me.c_a0)[0],
            c_b=_aff_to_hosts(cv, me.c_b),
            e=list(zip(e0, e1)),
            a=_limbs_to_ints(me.a),
            r=_limbs_to_ints(me.r),
            b=_limbs_to_ints(me.b),
            s=_limbs_to_ints(me.s),
            tau=_limbs_to_ints(me.tau),
        ),
    )


def host_proof_to_dev(cv: Curve, p: shuffle_mod.ShuffleProof) -> dev.ShuffleProofDev:
    """Host dataclass proof -> batched (B == 1) device proof."""
    return expand_proof(_host_proof_to_dev_unbatched(cv, p))


def _host_proof_to_dev_unbatched(cv: Curve, p: shuffle_mod.ShuffleProof) -> dev.ShuffleProofDev:
    L = cv.fr.L
    zero = p.product.hadamard.zero
    svp = p.product.svp
    me = p.multi_exp
    m = len(p.c_a)
    fqL = cv.fq.L
    empty = dev.AffP(
        jnp.zeros((0, fqL), jnp.uint32),
        jnp.zeros((0, fqL), jnp.uint32),
        jnp.zeros((0,), bool),
    )
    return dev.ShuffleProofDev(
        c_a=_hosts_to_aff(cv, p.c_a),
        c_b=_hosts_to_aff(cv, p.c_b),
        product=dev.ProductProofDev(
            c_b=_hosts_to_aff(cv, [p.product.c_b], squeeze=True),
            hadamard=dev.HadamardProofDev(
                c_B_mid=_hosts_to_aff(cv, p.product.hadamard.c_B_mid)
                if p.product.hadamard.c_B_mid
                else empty,
                zero=dev.ZeroProofDev(
                    c_a0=_hosts_to_aff(cv, [zero.c_a0], squeeze=True),
                    c_bm1=_hosts_to_aff(cv, [zero.c_bm1], squeeze=True),
                    c_d=_hosts_to_aff(cv, zero.c_d),
                    a=_ints_to_limb_arr(zero.a, L),
                    r=_ints_to_limb_arr(zero.r, L, scalar=True),
                    b=_ints_to_limb_arr(zero.b, L),
                    s=_ints_to_limb_arr(zero.s, L, scalar=True),
                    t=_ints_to_limb_arr(zero.t, L, scalar=True),
                ),
            ),
            svp=dev.SVPProofDev(
                c_d=_hosts_to_aff(cv, [svp.c_d], squeeze=True),
                c_delta=_hosts_to_aff(cv, [svp.c_delta], squeeze=True),
                c_Delta=_hosts_to_aff(cv, [svp.c_Delta], squeeze=True),
                a_tilde=_ints_to_limb_arr(svp.a_tilde, L),
                r_tilde=_ints_to_limb_arr(svp.r_tilde, L, scalar=True),
                b_tilde=_ints_to_limb_arr(svp.b_tilde, L),
                s_tilde=_ints_to_limb_arr(svp.s_tilde, L, scalar=True),
            ),
        ),
        multi_exp=dev.MultiExpProofDev(
            c_a0=_hosts_to_aff(cv, [me.c_a0], squeeze=True),
            c_b=_hosts_to_aff(cv, me.c_b),
            e0=_hosts_to_aff(cv, [pair[0] for pair in me.e]),
            e1=_hosts_to_aff(cv, [pair[1] for pair in me.e]),
            a=_ints_to_limb_arr(me.a, L),
            r=_ints_to_limb_arr(me.r, L, scalar=True),
            b=_ints_to_limb_arr(me.b, L, scalar=True),
            s=_ints_to_limb_arr(me.s, L, scalar=True),
            tau=_ints_to_limb_arr(me.tau, L, scalar=True),
        ),
    )
