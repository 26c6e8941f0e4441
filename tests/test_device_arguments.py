"""Device-resident shuffle argument == host-orchestrated shuffle argument.

Interop in both directions (device-prove -> host-verify and host-prove ->
device-verify) pins the transcript byte schedule exactly; a tampered output
deck must fail with the Hadamard flag first (reference failure order,
`tests.rs:213-226`).
"""

import jax
import numpy as np
import pytest

from mental_poker_tpu.arguments import device_api, shuffle as shuffle_host
from mental_poker_tpu.crypto import elgamal
from mental_poker_tpu.crypto.errors import HADAMARD, ProofVerificationError
from mental_poker_tpu.crypto.transcript import SHUFFLE_RNG_SEED, TranscriptBatch
from mental_poker_tpu.protocol.dl_cards import DLCards
from mental_poker_tpu.utils.rand import GameRng, ints_to_limbs

M, N_COLS = 2, 4
N = M * N_COLS


@pytest.fixture(scope="module")
def env():
    proto = DLCards()
    rng = GameRng(77)
    pp = proto.setup(rng, M, N_COLS)
    pk, sk = proto.player_keygen(rng, pp)
    proof = proto.prove_key_ownership(rng, pp, pk, sk, b"p1")
    agg = proto.compute_aggregate_key(pp, [(pk, proof, b"p1")])
    deck = elgamal.rand_ciphertexts(proto.cv, rng, N)
    pi = rng.permutation(N)
    rho = [rng.scalar(proto.cv.host.order) for _ in range(N)]
    shuffled, host_proof = proto.shuffle_and_remask(rng, pp, agg, deck, rho, pi)
    return proto, rng, pp, agg, deck, pi, rho, shuffled, host_proof


def _batched(cts, B=1):
    """[N] ciphertexts -> [B, N] (B == 1 expand)."""
    import jax

    return jax.tree.map(lambda a: a[None], cts)


def _dev_prove(proto, rng, pp, agg, deck, shuffled, pi, rho):
    cv = proto.cv
    keys = device_api.make_keys(pp, agg)
    rand = device_api.sample_shuffle_rand(rng, M, N_COLS, cv.fr.L, cv.host.order, batch=1)
    rho_c = ints_to_limbs(rho, cv.fr.L)[None]
    return device_api.prove_shuffle(
        cv, M, N_COLS, keys, _batched(deck), _batched(shuffled),
        np.asarray(pi, np.int32)[None], rho_c, rand,
    )


def test_host_prove_device_verify(env):
    proto, rng, pp, agg, deck, pi, rho, shuffled, host_proof = env
    cv = proto.cv
    keys = device_api.make_keys(pp, agg)
    dev_proof = device_api.host_proof_to_dev(cv, host_proof)
    checks = device_api.verify_shuffle(
        cv, M, N_COLS, keys, _batched(deck), _batched(shuffled), dev_proof
    )
    device_api.raise_by_flags(checks)  # must not raise


def test_device_prove_host_verify(env):
    proto, rng, pp, agg, deck, pi, rho, shuffled, host_proof = env
    cv = proto.cv
    dev_proof = _dev_prove(proto, rng, pp, agg, deck, shuffled, pi, rho)
    host_from_dev = device_api.dev_proof_to_host(cv, dev_proof)
    ts = TranscriptBatch.fixed(SHUFFLE_RNG_SEED, 1)
    shuffle_host.verify(pp, agg, deck, shuffled, host_from_dev, ts)  # must not raise


def test_device_prove_device_verify(env):
    proto, rng, pp, agg, deck, pi, rho, shuffled, host_proof = env
    cv = proto.cv
    keys = device_api.make_keys(pp, agg)
    dev_proof = _dev_prove(proto, rng, pp, agg, deck, shuffled, pi, rho)
    checks = device_api.verify_shuffle(
        cv, M, N_COLS, keys, _batched(deck), _batched(shuffled), dev_proof
    )
    device_api.raise_by_flags(checks)


def test_tampered_deck_fails_hadamard_first(env):
    proto, rng, pp, agg, deck, pi, rho, shuffled, host_proof = env
    cv = proto.cv
    keys = device_api.make_keys(pp, agg)
    dev_proof = _dev_prove(proto, rng, pp, agg, deck, shuffled, pi, rho)
    bogus = elgamal.rand_ciphertexts(cv, GameRng(123), N)
    checks = device_api.verify_shuffle(
        cv, M, N_COLS, keys, _batched(deck), _batched(bogus), dev_proof
    )
    with pytest.raises(ProofVerificationError) as e:
        device_api.raise_by_flags(checks)
    assert e.value.name == HADAMARD
