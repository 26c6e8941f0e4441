"""Protocol-level flow on the second curve (BLS12-377 G1) — the reference's
benchmark curve (`examples/parameter_selection.rs:25`, SURVEY E17). Proves the
protocol/crypto layers are curve-generic end-to-end, not just the field/curve
unit layers (tests/test_field.py, test_curve.py).

Kept to the mask -> verify -> reveal-token -> unmask path (CI compile budget;
the Bayer-Groth stack is exercised on BLS via `parameter_selection.run_sweep`
with `curve=bls12_377_g1()`)."""

import pytest

from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.crypto.errors import CHAUM_PEDERSEN, ProofVerificationError
from mental_poker_tpu.ops import curve as curve_mod
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng


def test_bls_mask_reveal_roundtrip():
    proto = DLCards(curve_mod.bls12_377_g1())
    rng = GameRng(17)
    pp = proto.setup(rng, 2, 2)
    pk, sk = proto.player_keygen(rng, pp)
    kproof = proto.prove_key_ownership(rng, pp, pk, sk, b"bls")
    agg = proto.compute_aggregate_key(pp, [(pk, kproof, b"bls")])

    cards = elgamal.rand_plaintexts(proto.cv, rng, 4)
    alphas = [rng.scalar(proto.cv.host.order) for _ in range(4)]
    masked, mproof = proto.mask(rng, pp, agg, cards, alphas)
    proto.verify_mask(pp, agg, cards, masked, mproof)

    token, tproof = proto.compute_reveal_token(rng, pp, sk, pk, masked)
    proto.verify_reveal(pp, pk, token, masked, tproof)
    plain = proto.unmask(pp, [(token, tproof, pk)], masked)
    assert proto.cv.to_host_points(plain) == proto.cv.to_host_points(cards)

    # negative: a tampered token fails with the reference-exact error
    bad = proto.cv.neg(token)
    with pytest.raises(ProofVerificationError) as ei:
        proto.verify_reveal(pp, pk, bad, masked, tproof)
    assert ei.value.name == CHAUM_PEDERSEN


def test_bls_bayer_groth_shuffle():
    """The FULL staged Bayer-Groth shuffle argument on BLS12-377 — the
    reference's benchmark-curve workload (`parameter_selection.rs:25,81-88`).
    Pins curve-genericity of the whole argument stack (commit -> challenges ->
    Hadamard/zero/SVP/product -> multi-exp) rather than asserting it."""
    import numpy as np

    from mental_poker_tpu.crypto.errors import HADAMARD

    proto = DLCards(curve_mod.bls12_377_g1())
    rng = GameRng(18)
    m, n = 2, 2
    N = m * n
    pp = proto.setup(rng, m, n)
    pk, sk = proto.player_keygen(rng, pp)
    kproof = proto.prove_key_ownership(rng, pp, pk, sk, b"bls")
    agg = proto.compute_aggregate_key(pp, [(pk, kproof, b"bls")])

    deck = elgamal.rand_ciphertexts(proto.cv, rng, N)
    rho = [rng.scalar(proto.cv.host.order) for _ in range(N)]
    pi = rng.permutation(N)
    shuffled, proof = proto.shuffle_and_remask(
        rng, pp, agg, deck, rho, pi, device_proof=True
    )
    proto.verify_shuffle(pp, agg, deck, shuffled, proof)

    # negative: substituting a random output deck must fail Hadamard-first,
    # exactly as tests.rs:213-226
    bogus = elgamal.rand_ciphertexts(proto.cv, rng, N)
    with pytest.raises(ProofVerificationError) as ei:
        proto.verify_shuffle(pp, agg, deck, bogus, proof)
    assert ei.value.name == HADAMARD
