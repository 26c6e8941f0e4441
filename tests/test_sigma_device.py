"""Device-resident sigma protocols interoperate with the host-orchestrated
ones (crypto/sigma.py) in both directions — pins the transcript byte
schedule — and verify correctly end-to-end."""

import jax
import numpy as np
import pytest

from mental_poker_tpu.crypto import elgamal, sigma, sigma_device as sd
from mental_poker_tpu.crypto.transcript import (
    KEY_OWN_RNG_SEED,
    MASKING_RNG_SEED,
    TranscriptBatch,
)
from mental_poker_tpu.ops import curve as curve_mod
from mental_poker_tpu.ops.field import limbs_to_int
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs


@pytest.fixture(scope="module")
def env():
    proto = DLCards()
    rng = GameRng(31)
    pp = proto.setup(rng, 2, 4)
    return proto, rng, pp


def test_schnorr_device_roundtrip_and_interop(env):
    proto, rng, pp = env
    cv = proto.cv
    B = 4
    order = cv.host.order
    sks = [rng.scalar(order) for _ in range(B)]
    pks = [cv.host.mul(sk, pp.enc.generator) for sk in sks]
    ks = [rng.scalar(order) for _ in range(B)]
    seeds = [KEY_OWN_RNG_SEED + bytes([i]) for i in range(B)]

    pk_dev = cv.from_host_points(pks)
    gen_tab = pp.enc.gen_table.table
    st = sd.init_batch(seeds)
    prove = jax.jit(
        lambda st, g, pk, sk, k: sd.schnorr_prove_dev(cv, st, g, pk, sk, k)
    )
    proof = prove(
        st, gen_tab, pk_dev, ints_to_limbs(sks, cv.fr.L), ints_to_limbs(ks, cv.fr.L)
    )

    # device verify
    verify = jax.jit(lambda st, g, pk, pr: sd.schnorr_verify_dev(cv, st, g, pk, pr))
    ok = verify(sd.init_batch(seeds), gen_tab, pk_dev, proof)
    assert bool(np.asarray(ok).all())

    # host verify of the device proof (interop)
    f = cv.fq
    t_hosts = []
    for i in range(B):
        inf = bool(np.asarray(proof.t.inf[i]))
        t_hosts.append(
            cv.host.identity
            if inf
            else (f.to_int(np.asarray(proof.t.x[i])), f.to_int(np.asarray(proof.t.y[i])), False)
        )
    s_ints = [limbs_to_int(np.asarray(proof.s[i])) for i in range(B)]
    host_proof = sigma.SchnorrProof(t_hosts, s_ints)
    sigma.schnorr_verify(cv, pp.enc.gen_table, pks, host_proof, TranscriptBatch(seeds))

    # host prove -> device verify
    host_proof2 = sigma.schnorr_prove(
        cv, pp.enc.gen_table, pks, sks, TranscriptBatch(seeds), rng
    )
    t_dev = cv.from_host_points(host_proof2.commit)
    xa, ya, infa = cv.to_affine(t_dev)
    proof2 = sd.SchnorrProofDev(
        sd.AffPt(xa, ya, infa), ints_to_limbs(host_proof2.response, cv.fr.L)
    )
    ok2 = verify(sd.init_batch(seeds), gen_tab, pk_dev, proof2)
    assert bool(np.asarray(ok2).all())

    # wrong sk fails
    bad = sd.SchnorrProofDev(proof.t, ints_to_limbs([s ^ 1 for s in s_ints], cv.fr.L))
    assert not bool(np.asarray(verify(sd.init_batch(seeds), gen_tab, pk_dev, bad)).any())


def test_cp_device_interop_mask_statement(env):
    proto, rng, pp = env
    cv = proto.cv
    B = 4
    order = cv.host.order
    pk, sk = proto.player_keygen(rng, pp)
    from mental_poker_tpu.protocol.dl_cards import AggregateKey
    from mental_poker_tpu.ops.msm import FixedBaseTable

    agg = AggregateKey(pk, FixedBaseTable(cv, pk))
    cards = elgamal.rand_plaintexts(cv, rng, B)
    alphas = [rng.scalar(order) for _ in range(B)]
    a_limbs = ints_to_limbs(alphas, cv.fr.L)
    masked = elgamal.encrypt(pp.enc, agg.table, cards, a_limbs)
    stmt_b = cv.add(masked.c1, cv.neg(cards))
    ks = [rng.scalar(order) for _ in range(B)]

    st = sd.init_batch([MASKING_RNG_SEED] * B)
    prove = jax.jit(
        lambda st, g, h, a, b, w, k: sd.cp_prove_dev(cv, st, g, h, a, b, w, k)
    )
    proof = prove(
        st,
        pp.enc.gen_table.table,
        agg.table.table,
        masked.c0,
        stmt_b,
        a_limbs,
        ints_to_limbs(ks, cv.fr.L),
    )

    verify = jax.jit(
        lambda st, g, h, a, b, pr: sd.cp_verify_dev(cv, st, g, h, a, b, pr)
    )
    ok = verify(
        sd.init_batch([MASKING_RNG_SEED] * B),
        pp.enc.gen_table.table,
        agg.table.table,
        masked.c0,
        stmt_b,
        proof,
    )
    assert bool(np.asarray(ok).all())

    # device proof verifies through the host path
    f = cv.fq

    def aff_to_hosts(a):
        out = []
        for i in range(B):
            if bool(np.asarray(a.inf[i])):
                out.append(cv.host.identity)
            else:
                out.append(
                    (f.to_int(np.asarray(a.x[i])), f.to_int(np.asarray(a.y[i])), False)
                )
        return out

    host_proof = sigma.ChaumPedersenProof(
        aff_to_hosts(proof.t_g),
        aff_to_hosts(proof.t_h),
        [limbs_to_int(np.asarray(proof.s[i])) for i in range(B)],
        (B,),
    )
    sigma.cp_verify(
        cv,
        pp.enc.gen_table,
        agg.table,
        masked.c0,
        stmt_b,
        host_proof,
        TranscriptBatch.fixed(MASKING_RNG_SEED, B),
    )
