"""Device-resident Fiat-Shamir transcript (ark-marlin FiatShamirRng<Blake2s>
semantics, bit-exact with crypto/transcript.py — pinned by
tests/test_transcript_jax.py).

Round 1 kept the transcript on host, forcing a device->host sync (plus a
Python Blake2s/ChaCha pass) at every absorb/challenge; with ~15 transcript
interactions per Bayer-Groth proof those syncs dominated wall-clock. This
module keeps the whole transcript state on device:

    state = (seed: uint32[..., 8],  word_idx: uint32[...])

- ``absorb(state, data)``: seed' = Blake2s(data || seed_bytes), stream reset.
- ``sample_field(state, field)``: arkworks ``UniformRand`` — draw the
  64-bit-word repr from the ChaCha20 word stream, mask the top word, reject
  until < modulus (a ``lax.while_loop``; ~2 rounds expected), and interpret
  the accepted words as the MONTGOMERY representation. For every field in
  this framework the arkworks R (2^(64*words)) equals the limb R (2^(16*L)),
  so the accepted draw IS the Montgomery-form limb array — asserted at trace
  time.

Everything is batched over leading dims: a [B]-batch of transcripts is
elementwise uint32 math, so `vmap`/explicit batching of whole proofs is free.
Reference transcript use-sites: `src/discrete_log_cards/mod.rs:139-164,202,
232,261,291,319,347,408,436`.
"""

from __future__ import annotations

import hashlib
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import Field
from . import hash_jax
from .hash_jax import blake2s, chacha20_words, words_to_bytes_u8

# Re-export the protocol domain-separation seeds (mod.rs:80-84).
from .transcript import (  # noqa: F401
    KEY_OWN_RNG_SEED,
    MASKING_RNG_SEED,
    REMASKING_RNG_SEED,
    REVEAL_RNG_SEED,
    SHUFFLE_RNG_SEED,
)


class DTState(NamedTuple):
    """Device transcript state: Blake2s seed words + keystream position."""

    seed: jnp.ndarray  # uint32[..., 8]
    widx: jnp.ndarray  # uint32[...]


def init(seed_bytes: bytes, batch_shape: tuple = ()) -> DTState:
    """Transcript from a static seed (domain-separation constant). The
    initial digest is host-computed (it is a compile-time constant)."""
    digest = hashlib.blake2s(seed_bytes).digest()
    words = np.frombuffer(digest, dtype=np.uint32)
    return DTState(
        jnp.broadcast_to(jnp.asarray(words), batch_shape + (8,)),
        jnp.zeros(batch_shape, jnp.uint32),
    )


def absorb(state: DTState, data_u8: jnp.ndarray) -> DTState:
    """seed' = Blake2s(data || seed_bytes); ChaCha stream restarts.

    `data_u8`: uint8[..., N] with batch dims broadcastable against the
    state's. N is static (transcript absorb schedules are shape-static).
    """
    seed_bytes = words_to_bytes_u8(state.seed)  # [..., 32]
    bshape = jnp.broadcast_shapes(data_u8.shape[:-1], seed_bytes.shape[:-1])
    data_u8 = jnp.broadcast_to(data_u8, bshape + data_u8.shape[-1:])
    seed_bytes = jnp.broadcast_to(seed_bytes, bshape + (32,))
    new_seed = blake2s(jnp.concatenate([data_u8, seed_bytes], axis=-1))
    return DTState(new_seed, jnp.zeros(bshape, jnp.uint32))


def _uniform_spec(fld: Field):
    """(n_u32_words, hi_word_mask) for the arkworks UniformRand draw."""
    bits = fld.p.bit_length()
    words64 = -(-bits // 64)
    shave = 64 * words64 - bits
    assert 16 * fld.L == 64 * words64, (
        f"limb R (2^{16 * fld.L}) != arkworks R (2^{64 * words64}) for {fld.name}; "
        "Montgomery reinterpretation would be wrong"
    )
    top64 = (1 << 64) - 1 >> shave
    hi_mask = np.uint32(top64 >> 32)
    return 2 * words64, hi_mask


def _words_to_limbs16(words: jnp.ndarray, L: int) -> jnp.ndarray:
    """uint32[..., W] -> uint32[..., 2W] 16-bit limbs (LE), padded to L."""
    lo = words & jnp.uint32(0xFFFF)
    hi = words >> jnp.uint32(16)
    limbs = jnp.stack([lo, hi], axis=-1).reshape(words.shape[:-1] + (2 * words.shape[-1],))
    if limbs.shape[-1] < L:
        limbs = jnp.concatenate(
            [limbs, jnp.zeros(limbs.shape[:-1] + (L - limbs.shape[-1],), jnp.uint32)],
            axis=-1,
        )
    return limbs


def sample_field(state: DTState, fld: Field):
    """-> (state', mont_limbs uint32[..., L]).

    Per-lane rejection sampling: rejected lanes keep drawing from their own
    keystream; accepted lanes stop consuming words (matching B independent
    host transcripts exactly).
    """
    nw, hi_mask = _uniform_spec(fld)
    L = fld.L
    p_limbs = jnp.asarray(fld.p_limbs)
    bshape = state.widx.shape

    align = nw if 16 % nw == 0 or nw % 16 == 0 else 1

    def draw(widx):
        words = chacha20_words(state.seed, widx, nw, align=align)
        words = words.at[..., nw - 1].set(words[..., nw - 1] & hi_mask)
        limbs = _words_to_limbs16(words, L)
        ok = fld.canonical_lt(limbs, jnp.broadcast_to(p_limbs, limbs.shape))
        return limbs, ok

    limbs0, ok0 = draw(state.widx)
    widx0 = state.widx + jnp.uint32(nw)

    def cond(carry):
        _, _, done = carry
        return ~jnp.all(done)

    def body(carry):
        widx, limbs, done = carry
        cand, ok = draw(widx)
        widx2 = jnp.where(done, widx, widx + jnp.uint32(nw))
        limbs2 = jnp.where((~done & ok)[..., None], cand, limbs)
        return widx2, limbs2, done | ok

    widx, limbs, _ = jax.lax.while_loop(cond, body, (widx0, limbs0, ok0))
    return DTState(state.seed, widx), limbs


def sample_fields(state: DTState, fld: Field, k: int):
    """k sequential draws -> (state', limbs uint32[..., k, L])."""
    outs = []
    for _ in range(k):
        state, v = sample_field(state, fld)
        outs.append(v)
    return state, jnp.stack(outs, axis=-2)
