"""Unit tests for the Bayer-Groth sub-arguments (zero, SVP, Hadamard,
product, multi-exponentiation), positive + tampered-negative each.

The reference has no sub-argument tests (the crate is unvendored); these pin
our own prover/verifier consistency and soundness checks.
"""

import numpy as np
import pytest

from mental_poker_tpu.arguments import (
    hadamard,
    multi_exponentiation as me,
    product,
    single_value_product as svp,
    zero,
)
from mental_poker_tpu.arguments.common import bilinear, com_many, vec_hadamard
from mental_poker_tpu.crypto import elgamal, pedersen
from mental_poker_tpu.crypto.errors import ProofVerificationError
from mental_poker_tpu.crypto.transcript import TranscriptBatch
from mental_poker_tpu.ops import curve as curve_mod
from mental_poker_tpu.utils.rand import GameRng

M, N_ = 3, 4


@pytest.fixture(scope="module")
def cv():
    return curve_mod.stark_curve()


@pytest.fixture(scope="module")
def rng():
    return GameRng(31337)


@pytest.fixture(scope="module")
def ck(cv, rng):
    return pedersen.setup(cv, rng, N_)


def fresh_ts():
    return TranscriptBatch([b"test-argument"])


def test_zero_argument(cv, rng, ck):
    q = cv.host.order
    # build rows with sum_i <a_i, b_i>_y = 0: choose last b row to cancel.
    y = rng.scalar(q)
    a_rows = [[rng.scalar(q) for _ in range(N_)] for _ in range(M)]
    b_rows = [[rng.scalar(q) for _ in range(N_)] for _ in range(M)]
    acc = sum(bilinear(a_rows[i], b_rows[i], y, q) for i in range(M - 1)) % q
    # solve for b_rows[-1][0]: a_last[0]*b*y^1 = -acc - rest
    rest = bilinear(a_rows[-1], [0] + b_rows[-1][1:], y, q)
    binv = pow(a_rows[-1][0] * y % q, -1, q)
    b_rows[-1][0] = (-(acc + rest)) * binv % q
    assert sum(bilinear(a_rows[i], b_rows[i], y, q) for i in range(M)) % q == 0

    r_list = [rng.scalar(q) for _ in range(M)]
    s_list = [rng.scalar(q) for _ in range(M)]
    c_a = com_many(ck, a_rows, r_list)
    c_b = com_many(ck, b_rows, s_list)
    proof = zero.prove(ck, fresh_ts(), rng, a_rows, r_list, b_rows, s_list, y)
    zero.verify(ck, fresh_ts(), proof, c_a, c_b, y)  # no raise

    bad = zero.ZeroProof(
        proof.c_a0, proof.c_bm1, proof.c_d, proof.a, (proof.r + 1) % q,
        proof.b, proof.s, proof.t,
    )
    with pytest.raises(ProofVerificationError):
        zero.verify(ck, fresh_ts(), bad, c_a, c_b, y)


def test_svp_argument(cv, rng, ck):
    q = cv.host.order
    a = [rng.scalar(q) for _ in range(N_)]
    v = 1
    for x in a:
        v = v * x % q
    r = rng.scalar(q)
    c_a = com_many(ck, [a], [r])[0]
    proof = svp.prove(ck, fresh_ts(), rng, a, r, v)
    svp.verify(ck, fresh_ts(), proof, c_a, v)  # no raise

    with pytest.raises(ProofVerificationError):
        svp.verify(ck, fresh_ts(), proof, c_a, (v + 1) % q)


def test_hadamard_argument(cv, rng, ck):
    q = cv.host.order
    a_rows = [[rng.scalar(q) for _ in range(N_)] for _ in range(M)]
    b = a_rows[0]
    for row in a_rows[1:]:
        b = vec_hadamard(b, row, q)
    r_list = [rng.scalar(q) for _ in range(M)]
    s = rng.scalar(q)
    c_a = com_many(ck, a_rows, r_list)
    c_b = com_many(ck, [b], [s])[0]
    proof = hadamard.prove(ck, fresh_ts(), rng, a_rows, r_list, b, s)
    hadamard.verify(ck, fresh_ts(), proof, c_a, c_b)  # no raise

    wrong_b = com_many(ck, [[rng.scalar(q) for _ in range(N_)]], [s])[0]
    with pytest.raises(ProofVerificationError) as ei:
        hadamard.verify(ck, fresh_ts(), proof, c_a, wrong_b)
    assert ei.value.name == "Hadamard Product (5.1)"


def test_product_argument(cv, rng, ck):
    q = cv.host.order
    a_rows = [[rng.scalar(q) for _ in range(N_)] for _ in range(M)]
    v = 1
    for row in a_rows:
        for x in row:
            v = v * x % q
    r_list = [rng.scalar(q) for _ in range(M)]
    c_a = com_many(ck, a_rows, r_list)
    proof = product.prove(ck, fresh_ts(), rng, a_rows, r_list, v)
    product.verify(ck, fresh_ts(), proof, c_a, v)  # no raise

    with pytest.raises(ProofVerificationError):
        product.verify(ck, fresh_ts(), proof, c_a, (v * 2) % q)


def test_multi_exponentiation(cv, rng, ck):
    q = cv.host.order
    m, n = 2, N_
    enc = elgamal.setup(cv, rng)
    pk_host, _sk = elgamal.keygen(enc, rng)
    from mental_poker_tpu.ops.msm import FixedBaseTable

    pk_table = FixedBaseTable(cv, pk_host)
    gen2 = cv.host.rand_point(rng.rng)
    ctx = {
        "cv": cv,
        "ck": ck,
        "enc_gen_table": enc.gen_table,
        "pk_table": pk_table,
        "gen_table": FixedBaseTable(cv, gen2),
    }
    C = elgamal.rand_ciphertexts(cv, rng, m * n)
    from mental_poker_tpu.arguments.shuffle import _as_matrix

    Cm = _as_matrix(C, m, n)
    a_rows = [[rng.scalar(q) for _ in range(n)] for _ in range(m)]
    r_list = [rng.scalar(q) for _ in range(m)]
    rho = rng.scalar(q)
    c_a = com_many(ck, a_rows, r_list)

    # target = E(0; rho) + sum_i <A_i, C_i>
    flat_scalars = [x for row in a_rows for x in row]
    msm_pair = me._cipher_msm_flat(cv, C, flat_scalars)
    t_limbs_ctx = dict(ctx)
    blind = me._enc_with_generator(ctx, 0, rho)
    target = me._cipher_add_host(cv, blind, msm_pair)

    proof = me.prove(ctx, fresh_ts(), rng, Cm, a_rows, r_list, rho)
    me.verify(ctx, fresh_ts(), proof, Cm, target, c_a)  # no raise

    bad_target = me._cipher_add_host(cv, target, blind)
    with pytest.raises(ProofVerificationError):
        me.verify(ctx, fresh_ts(), proof, Cm, bad_target, c_a)
