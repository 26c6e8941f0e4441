"""Discrete-log Barnett-Smart card protocol (TPU batch-first).

Implements the reference's `BarnettSmartProtocol` trait surface — all 14
methods of `src/lib.rs:41-198` as instantiated by
`src/discrete_log_cards/mod.rs:86-444` — over batched device arrays:

  setup, player_keygen, prove/verify_key_ownership, compute_aggregate_key,
  mask, verify_mask, remask, verify_remask, compute_reveal_token,
  verify_reveal, unmask, shuffle_and_remask, verify_shuffle.

Type mapping (reference `mod.rs:63-103`):
  Card        = ElGamal plaintext  -> PointP batch
  MaskedCard  = ElGamal ciphertext -> Ciphertexts batch
  RevealToken = ElGamal plaintext  -> PointP batch
  ZKProofKeyOwnership = Schnorr;  Masking/Remasking/Reveal = Chaum-Pedersen;
  Shuffle = Bayer-Groth shuffle argument (arguments/shuffle.py).

Each method is natively *batched*: the reference's single-card calls are the
batch=1 special case. Transcript seeds match `mod.rs:80-84` exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto import elgamal, sigma
from . import api
from ..crypto.elgamal import Ciphertexts
from ..crypto.errors import CardProtocolError, CryptoError
from ..crypto.transcript import (
    KEY_OWN_RNG_SEED,
    MASKING_RNG_SEED,
    REMASKING_RNG_SEED,
    REVEAL_RNG_SEED,
    TranscriptBatch,
)
from ..ops import curve as curve_mod
from ..ops.curve import PointP
from ..ops.msm import FixedBaseTable
from ..utils.rand import GameRng, ints_to_limbs


@dataclasses.dataclass
class AggregateKey:
    """Aggregate ElGamal public key with its fixed-base table."""

    host: tuple
    table: FixedBaseTable


class Parameters:
    """Protocol parameters (`mod.rs:37-61`): (m, n) deck split, ElGamal
    parameters, Pedersen commit key, and the extra shuffle generator."""

    def __init__(self, cv, m, n, enc, commit_key, shuffle_generator):
        self.cv = cv
        self.m = m
        self.n = n
        self.enc = enc
        self.commit_key = commit_key
        self.shuffle_generator = shuffle_generator

    @property
    def num_cards(self):
        return self.m * self.n


class DLCards(api.BarnettSmartProtocol, api.Mask, api.Remask, api.Reveal):
    """The discrete-log instantiation (`DLCards<C>`, `mod.rs:33-35`) of the
    abstract `BarnettSmartProtocol` trait (protocol/api.py <- lib.rs:41-198).

    Associated-type bindings (`mod.rs:87-103`): Enc = ElGamalScheme,
    Comm = PedersenScheme; swap either by passing a different
    `HomomorphicEncryptionScheme` / `HomomorphicCommitmentScheme`."""

    def __init__(self, cv=None, enc_scheme=None, comm_scheme=None):
        self.cv = cv or curve_mod.stark_curve()
        self.enc_scheme = enc_scheme or api.ElGamalScheme()
        self.comm_scheme = comm_scheme or api.PedersenScheme()

    # ------------------------------------------------------------- ceremony
    def setup(self, rng: GameRng, m: int, n: int) -> Parameters:
        """`mod.rs:105-121`: ElGamal setup + Pedersen setup(n) + generator."""
        cv = self.cv
        enc = self.enc_scheme.setup(cv, rng)
        commit_key = self.comm_scheme.setup(cv, rng, n)
        shuffle_generator = cv.host.rand_point(rng.rng)
        return Parameters(cv, m, n, enc, commit_key, shuffle_generator)

    def player_keygen(self, rng: GameRng, pp: Parameters):
        """-> (pk_host, sk_int) (`mod.rs:123-130`)."""
        return self.enc_scheme.keygen(pp.enc, rng)

    def prove_key_ownership(self, rng, pp, pk, sk, player_public_info: bytes):
        """Schnorr proof bound to the player's public info (`mod.rs:132-149`)."""
        ts = TranscriptBatch([KEY_OWN_RNG_SEED + bytes(player_public_info)])
        return sigma.schnorr_prove(pp.cv, pp.enc.gen_table, [pk], [sk], ts, rng)

    def verify_key_ownership(self, pp, pk, player_public_info: bytes, proof):
        ts = TranscriptBatch([KEY_OWN_RNG_SEED + bytes(player_public_info)])
        sigma.schnorr_verify(pp.cv, pp.enc.gen_table, [pk], proof, ts)

    def compute_aggregate_key(self, pp, player_keys_proof_info) -> AggregateKey:
        """Verify every key-ownership proof, then sum the keys
        (`mod.rs:167-180`); verification is one batched Schnorr check."""
        cv = pp.cv
        pks = [pk for pk, _, _ in player_keys_proof_info]
        seeds = [KEY_OWN_RNG_SEED + bytes(info) for _, _, info in player_keys_proof_info]
        proof = sigma.SchnorrProof(
            [p.commit[0] for _, p, _ in player_keys_proof_info],
            [p.response[0] for _, p, _ in player_keys_proof_info],
        )
        try:
            sigma.schnorr_verify(cv, pp.enc.gen_table, pks, proof, TranscriptBatch(seeds))
        except CryptoError as e:
            raise CardProtocolError(e) from e
        acc = cv.host.identity
        for pk in pks:
            acc = cv.host.add(acc, pk)
        return AggregateKey(acc, FixedBaseTable(cv, acc))

    # ------------------------------------------------------------- masking
    def mask(self, rng, pp, shared_key: AggregateKey, cards: PointP, alphas):
        """Mask a batch of cards; returns (masked, proof) (`mod.rs:182-212`).

        cards: PointP [...]; alphas: flat list of ints (C-order over batch).
        Chaum-Pedersen statement: (c0, c1 - card) over bases (g, agg_pk).
        """
        cv = pp.cv
        shape = cards.x.shape[:-1]
        a_limbs = ints_to_limbs(alphas, cv.fr.L).reshape(shape + (cv.fr.L,))
        masked = self.enc_scheme.encrypt(pp.enc, shared_key.table, cards, a_limbs)
        stmt_b = cv.add(masked.c1, cv.neg(cards))
        B = int(np.prod(shape)) if shape else 1
        ts = TranscriptBatch.fixed(MASKING_RNG_SEED, B)
        proof = sigma.cp_prove(
            cv, pp.enc.gen_table, shared_key.table, masked.c0, stmt_b, list(alphas), ts, rng
        )
        return masked, proof

    def verify_mask(self, pp, shared_key: AggregateKey, cards: PointP, masked: Ciphertexts, proof):
        """`mod.rs:214-239`; raises CryptoError("Chaum-Pedersen") on failure."""
        cv = pp.cv
        shape = cards.x.shape[:-1]
        stmt_b = cv.add(masked.c1, cv.neg(cards))
        B = int(np.prod(shape)) if shape else 1
        ts = TranscriptBatch.fixed(MASKING_RNG_SEED, B)
        sigma.cp_verify(cv, pp.enc.gen_table, shared_key.table, masked.c0, stmt_b, proof, ts)

    # ------------------------------------------------------------ remasking
    def remask(self, rng, pp, shared_key: AggregateKey, original: Ciphertexts, alphas):
        """Remask = add an encryption of zero (`remasking.rs:15-21`,
        `mod.rs:241-271`). Statement: remasked - original over (g, agg_pk)."""
        cv = pp.cv
        shape = original.c0.x.shape[:-1]
        a_limbs = ints_to_limbs(alphas, cv.fr.L).reshape(shape + (cv.fr.L,))
        zero_enc = self.enc_scheme.encrypt_zero(pp.enc, shared_key.table, a_limbs)
        remasked = self.enc_scheme.add(cv, original, zero_enc)
        stmt = self.enc_scheme.sub(cv, remasked, original)
        B = int(np.prod(shape)) if shape else 1
        ts = TranscriptBatch.fixed(REMASKING_RNG_SEED, B)
        proof = sigma.cp_prove(
            cv, pp.enc.gen_table, shared_key.table, stmt.c0, stmt.c1, list(alphas), ts, rng
        )
        return remasked, proof

    def verify_remask(self, pp, shared_key, original: Ciphertexts, remasked: Ciphertexts, proof):
        cv = pp.cv
        shape = original.c0.x.shape[:-1]
        stmt = self.enc_scheme.sub(cv, remasked, original)
        B = int(np.prod(shape)) if shape else 1
        ts = TranscriptBatch.fixed(REMASKING_RNG_SEED, B)
        sigma.cp_verify(cv, pp.enc.gen_table, shared_key.table, stmt.c0, stmt.c1, proof, ts)

    # -------------------------------------------------------------- reveal
    def compute_reveal_token(self, rng, pp, sk: int, pk, masked: Ciphertexts):
        """token = sk * c0 with a Chaum-Pedersen proof over bases (c0, g)
        and statement (token, pk) (`mod.rs:300-329`). Batched over cards."""
        cv = pp.cv
        shape = masked.c0.x.shape[:-1]
        B = int(np.prod(shape)) if shape else 1
        sk_limbs = ints_to_limbs([sk] * B, cv.fr.L).reshape(shape + (cv.fr.L,))
        token = cv.scalar_mul(sk_limbs, masked.c0)
        pk_dev = self._broadcast_host_point(pk, shape)
        ts = TranscriptBatch.fixed(REVEAL_RNG_SEED, B)
        proof = sigma.cp_prove(
            cv, masked.c0, pp.enc.gen_table, token, pk_dev, [sk] * B, ts, rng
        )
        return token, proof

    def verify_reveal(self, pp, pk, token: PointP, masked: Ciphertexts, proof):
        """`mod.rs:331-354`."""
        cv = pp.cv
        shape = masked.c0.x.shape[:-1]
        B = int(np.prod(shape)) if shape else 1
        pk_dev = self._broadcast_host_point(pk, shape)
        ts = TranscriptBatch.fixed(REVEAL_RNG_SEED, B)
        sigma.cp_verify(cv, masked.c0, pp.enc.gen_table, token, pk_dev, proof, ts)

    def unmask(self, pp, decryption_key, masked: Ciphertexts) -> PointP:
        """Verify every player's token proof, aggregate tokens, decrypt
        (`mod.rs:356-378`, `reveal.rs:14-18`): card = -sum(tokens) + c1."""
        cv = pp.cv
        agg = None
        for token, proof, pk in decryption_key:
            try:
                self.verify_reveal(pp, pk, token, masked, proof)
            except CryptoError as e:
                raise CardProtocolError(e) from e
            agg = token if agg is None else cv.add(agg, token)
        return self.reveal_cards(agg, masked)

    # ------------------------------------------------------------- shuffle
    def shuffle_and_remask(
        self, rng, pp, shared_key, deck: Ciphertexts, masking_factors, permutation,
        device_proof: bool = False,
    ):
        """Permute + remask the deck and emit a Bayer-Groth shuffle proof
        (`mod.rs:380-418`). `permutation`: int array pi, output[i] = deck[pi[i]];
        `masking_factors`: [N] ints.

        Proving runs on the device-resident staged prover (arguments/staged);
        the result converts to the host dataclass proof for serialization/API
        compatibility unless `device_proof=True` (the fast path — keeps the
        proof as device arrays that `verify_shuffle` consumes directly).
        """
        from ..arguments import device_api

        cv = pp.cv
        N = pp.num_cards
        pi = jnp.asarray(permutation, jnp.int32)
        batched = pi.ndim == 2  # [B, N] decks proved natively in one dispatch
        B = pi.shape[0] if batched else 1
        pi_b = pi if batched else pi[None]
        deck_b = deck if batched else jax.tree.map(lambda a: a[None], deck)

        # coords are [B, N, L]; gather the deck axis under the permutation
        permuted = jax.tree.map(
            lambda a: jnp.take_along_axis(a, pi_b[..., None], axis=1), deck_b
        )
        rho = ints_to_limbs(
            list(np.asarray(masking_factors, dtype=object).reshape(-1)), cv.fr.L
        ).reshape(B, N, cv.fr.L)
        zero_enc = elgamal.encrypt_zero(pp.enc, shared_key.table, rho)
        shuffled = elgamal.cipher_add(cv, permuted, zero_enc)

        keys = device_api.make_keys(pp, shared_key)
        rand = device_api.sample_shuffle_rand(
            rng, pp.m, pp.n, cv.fr.L, cv.host.order, batch=B
        )
        dev_proof = device_api.prove_shuffle(
            cv, pp.m, pp.n, keys, deck_b, shuffled, pi_b, jnp.asarray(rho), rand
        )
        if not batched:
            shuffled = jax.tree.map(lambda a: a[0], shuffled)
        if device_proof:
            return shuffled, dev_proof
        assert not batched or B == 1, "host-dataclass proofs are single-statement; use device_proof=True for batches"
        return shuffled, device_api.dev_proof_to_host(cv, dev_proof)

    def verify_shuffle(self, pp, shared_key, original: Ciphertexts, shuffled: Ciphertexts, proof):
        """`mod.rs:420-443`; raises the reference-ordered
        ProofVerificationError ("Hadamard Product (5.1)" first) on failure.

        Accepts single decks ([N] ciphertexts + host/device proof) or native
        batches ([B, N] ciphertexts + a batched device proof)."""
        from ..arguments import device_api
        from ..arguments.device import ShuffleProofDev

        cv = pp.cv
        keys = device_api.make_keys(pp, shared_key)
        if isinstance(proof, ShuffleProofDev):
            dev_proof = proof if proof.c_a.x.ndim == 3 else device_api.expand_proof(proof)
        else:
            dev_proof = device_api.host_proof_to_dev(cv, proof)
        batched = original.c0.x.ndim == 3  # [B, N, L] coords
        bat = (lambda c: c) if batched else (lambda c: jax.tree.map(lambda a: a[None], c))
        checks = device_api.verify_shuffle(
            cv, pp.m, pp.n, keys, bat(original), bat(shuffled), dev_proof
        )
        device_api.raise_by_flags(checks)

    # ---------------------------------------------- Mask/Remask/Reveal traits
    def mask_cards(self, pp, shared_key, cards: PointP, r) -> Ciphertexts:
        """`Card::mask` = ElGamal encrypt (`masking.rs:10-20`), proof-free."""
        cv = pp.cv
        shape = cards.x.shape[:-1]
        r_limbs = ints_to_limbs(r, cv.fr.L).reshape(shape + (cv.fr.L,))
        return self.enc_scheme.encrypt(pp.enc, shared_key.table, cards, r_limbs)

    def remask_cards(self, pp, shared_key, masked: Ciphertexts, r) -> Ciphertexts:
        """`MaskedCard::remask` = add an encryption of zero
        (`remasking.rs:15-21`), proof-free."""
        cv = pp.cv
        shape = masked.c0.x.shape[:-1]
        r_limbs = ints_to_limbs(r, cv.fr.L).reshape(shape + (cv.fr.L,))
        zero_enc = self.enc_scheme.encrypt_zero(pp.enc, shared_key.table, r_limbs)
        return self.enc_scheme.add(cv, masked, zero_enc)

    def reveal_cards(self, aggregate_token: PointP, masked: Ciphertexts) -> PointP:
        """`RevealToken::reveal` = -token + c1 (`reveal.rs:14-18`)."""
        cv = self.cv
        return cv.add(cv.neg(aggregate_token), masked.c1)

    # ------------------------------------------------------------- helpers
    def _broadcast_host_point(self, hp, shape) -> PointP:
        cv = self.cv
        P = cv.from_host_points([hp])
        L = P.x.shape[-1]
        return PointP(
            jnp.broadcast_to(P.x[0], shape + (L,)),
            jnp.broadcast_to(P.y[0], shape + (L,)),
            jnp.broadcast_to(P.z[0], shape + (L,)),
        )
