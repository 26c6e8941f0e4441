"""Abstract trait layer (protocol/api.py <- src/lib.rs:16-198,
proof-essentials scheme/argument traits)."""

import numpy as np
import pytest

from mental_poker_tpu.crypto.errors import ProofVerificationError
from mental_poker_tpu.crypto.transcript import TranscriptBatch
from mental_poker_tpu.protocol import api
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng


def test_dlcards_implements_all_traits():
    d = DLCards()
    for trait in (api.BarnettSmartProtocol, api.Mask, api.Remask, api.Reveal):
        assert isinstance(d, trait)
    assert isinstance(d.enc_scheme, api.HomomorphicEncryptionScheme)
    assert isinstance(d.comm_scheme, api.HomomorphicCommitmentScheme)


def test_incomplete_backend_rejected():
    class Partial(api.BarnettSmartProtocol):
        def setup(self, rng, m, n):  # one of fourteen
            return None

    with pytest.raises(TypeError):
        Partial()  # abstractmethods unimplemented


def test_protocol_trait_method_surface():
    """The 14 reference methods (lib.rs:74-197), by name."""
    methods = {
        "setup", "player_keygen", "prove_key_ownership", "verify_key_ownership",
        "compute_aggregate_key", "mask", "verify_mask", "remask",
        "verify_remask", "compute_reveal_token", "verify_reveal", "unmask",
        "shuffle_and_remask", "verify_shuffle",
    }
    assert methods <= set(api.BarnettSmartProtocol.__abstractmethods__)
    assert len(api.BarnettSmartProtocol.__abstractmethods__) == 14


def test_argument_of_knowledge_adapters():
    """SchnorrIdentification and DLEquality satisfy the E5 trait shape:
    prove(params, statement, witness, ts, rng) / verify(...)."""
    d = DLCards()
    cv = d.cv
    rng = GameRng(5)
    pp = d.setup(rng, 2, 2)

    # Schnorr over the ElGamal generator base
    pk, sk = d.player_keygen(rng, pp)
    arg = api.SchnorrIdentification()
    ts = TranscriptBatch.fixed(b"api test", 1)
    proof = arg.prove((cv, pp.enc.gen_table), [pk], [sk], ts, rng)
    arg.verify((cv, pp.enc.gen_table), [pk], proof, TranscriptBatch.fixed(b"api test", 1))
    # wrong statement fails with the reference error string
    pk2, _ = d.player_keygen(rng, pp)
    with pytest.raises(ProofVerificationError, match="Schnorr Identification"):
        arg.verify(
            (cv, pp.enc.gen_table), [pk2], proof, TranscriptBatch.fixed(b"api test", 1)
        )

    # DLEquality: a = w*g, b = w*h over bases (g, h)
    w = rng.scalar(cv.host.order)
    from mental_poker_tpu.crypto.group import base_mul
    from mental_poker_tpu.utils.rand import ints_to_limbs

    h_host = cv.host.rand_point(rng.rng)
    h = cv.from_host_points([h_host])
    wl = ints_to_limbs([w], cv.fr.L)
    a = base_mul(cv, pp.enc.gen_table, wl)
    b = cv.scalar_mul(wl, h)
    cp = api.DLEquality()
    ts = TranscriptBatch.fixed(b"api cp", 1)
    prf = cp.prove((cv, pp.enc.gen_table, h), (a, b), [w], ts, rng)
    cp.verify((cv, pp.enc.gen_table, h), (a, b), prf, TranscriptBatch.fixed(b"api cp", 1))
    with pytest.raises(ProofVerificationError, match="Chaum-Pedersen"):
        cp.verify(
            (cv, pp.enc.gen_table, h), (b, a), prf, TranscriptBatch.fixed(b"api cp", 1)
        )


def test_shuffle_argument_adapter_roundtrip():
    """ShuffleArgument adapter (E8 via the E5 trait, mod.rs:409-415,437-442):
    host prove -> host verify round-trips, and a substituted output deck fails
    with the reference's Hadamard-first error (tests.rs:213-226). This is also
    the direct CI caller of the host Bayer-Groth prover
    (arguments/shuffle.py::prove)."""
    from mental_poker_tpu.crypto import elgamal
    from mental_poker_tpu.crypto.transcript import SHUFFLE_RNG_SEED

    d = DLCards()
    rng = GameRng(9)
    m, n = 2, 2
    pp = d.setup(rng, m, n)
    pk, sk = d.player_keygen(rng, pp)
    proof_k = d.prove_key_ownership(rng, pp, pk, sk, b"P")
    agg = d.compute_aggregate_key(pp, [(pk, proof_k, b"P")])

    N = m * n
    deck = elgamal.rand_ciphertexts(d.cv, rng, N)
    pi = rng.permutation(N)
    rho = [rng.scalar(d.cv.host.order) for _ in range(N)]
    shuffled, _ = d.shuffle_and_remask(rng, pp, agg, deck, rho, pi)

    arg = api.ShuffleArgument()
    params = (pp, agg)
    ts = TranscriptBatch.fixed(SHUFFLE_RNG_SEED, 1)
    proof = arg.prove(params, (deck, shuffled), (pi, rho), ts, rng)
    arg.verify(params, (deck, shuffled), proof, TranscriptBatch.fixed(SHUFFLE_RNG_SEED, 1))
    # substituted output deck fails Hadamard-first, as tests.rs:213-226
    bogus = elgamal.rand_ciphertexts(d.cv, GameRng(123), N)
    with pytest.raises(ProofVerificationError, match="Hadamard"):
        arg.verify(params, (deck, bogus), proof, TranscriptBatch.fixed(SHUFFLE_RNG_SEED, 1))


def test_mask_remask_reveal_traits_roundtrip():
    """Card-op traits (lib.rs:16-36): mask -> remask -> aggregate-token reveal
    recovers the plaintext without the proof machinery."""
    from mental_poker_tpu.crypto import elgamal

    d = DLCards()
    rng = GameRng(6)
    pp = d.setup(rng, 2, 2)
    pk, sk = d.player_keygen(rng, pp)
    proof = d.prove_key_ownership(rng, pp, pk, sk, b"P")
    agg = d.compute_aggregate_key(pp, [(pk, proof, b"P")])
    cards = elgamal.rand_plaintexts(d.cv, rng, 4)

    r1 = [rng.scalar(d.cv.host.order) for _ in range(4)]
    r2 = [rng.scalar(d.cv.host.order) for _ in range(4)]
    masked = d.mask_cards(pp, agg, cards, r1)
    remasked = d.remask_cards(pp, agg, masked, r2)
    # aggregate token with the single player's sk
    from mental_poker_tpu.utils.rand import ints_to_limbs

    sk_limbs = ints_to_limbs([sk] * 4, d.cv.fr.L)
    token = d.cv.scalar_mul(sk_limbs, remasked.c0)
    opened = d.reveal_cards(token, remasked)
    ok = np.asarray(d.cv.eq(opened, cards))
    assert bool(ok.all())
