"""Device-side Blake2s and ChaCha20 in pure uint32 jnp ops.

These power the *device-resident* Fiat-Shamir transcript
(`crypto/transcript_jax.py`): the reference threads an
`ark_marlin::FiatShamirRng<Blake2s>` through every prover/verifier
(`src/discrete_log_cards/mod.rs:9,139-164,202,...`), and round 1 implemented
it host-side (crypto/transcript.py) — which forces a device->host->device
round-trip at every absorb/challenge. Profiling showed those synchronization
points dominate proving wall-clock (~94 s/proof on the tunneled TPU). Moving
the transcript on-device lets the whole Bayer-Groth prove/verify compile to a
single XLA program with zero host traffic, and `vmap` then batches whole
deck-batches of independent transcripts for free.

Both algorithms are pure 32-bit word machines — a perfect fit for the TPU
VPU. State is kept as uint32 vectors; rounds use the classic 4-lane SIMD
formulation (column step = elementwise over 4-word rows, diagonal step =
rotated rows), so a batched transcript is [B, 4]-shaped elementwise math.

Bit-exactness against hashlib.blake2s / the host ChaCha20 is pinned by
tests/test_hash_jax.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MASK32 = jnp.uint32(0xFFFFFFFF)


def _rotr(v, n: int):
    """Rotate-right each uint32 lane by a static n."""
    return (v >> jnp.uint32(n)) | (v << jnp.uint32(32 - n))


def _rotl(v, n: int):
    return (v << jnp.uint32(n)) | (v >> jnp.uint32(32 - n))


# ---------------------------------------------------------------------------
# Blake2s
# ---------------------------------------------------------------------------

_BLAKE2S_IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

_SIGMA = np.array(
    [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    ],
    dtype=np.int32,
)

# 4-lane SIMD message-word index layout per round: for the column step the
# four G's consume m[sigma[2i]], m[sigma[2i+1]] for i=0..3; diagonal likewise
# with i=4..7. Precompute gather indices [10 rounds, 4 steps, 4 lanes]:
# steps = (col-a, col-b, diag-a, diag-b).
_MSG_IDX = np.zeros((10, 4, 4), dtype=np.int32)
for _r in range(10):
    for _i in range(4):
        _MSG_IDX[_r, 0, _i] = _SIGMA[_r, 2 * _i]
        _MSG_IDX[_r, 1, _i] = _SIGMA[_r, 2 * _i + 1]
        _MSG_IDX[_r, 2, _i] = _SIGMA[_r, 8 + 2 * _i]
        _MSG_IDX[_r, 3, _i] = _SIGMA[_r, 8 + 2 * _i + 1]


def _g_vec(a, b, c, d, mx, my):
    """Four parallel Blake2s G functions over 4-lane rows ([..., 4] uint32)."""
    a = a + b + mx
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + my
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


def _blake2s_compress(h, m, t: int, last: bool):
    """One compression: h [..., 8], m [..., 16], t/last static Python values.

    Static t/last is the transcript's common case: every absorb has a
    statically-known byte length, so block counts and flags fold into the
    compiled program.
    """
    iv = jnp.asarray(_BLAKE2S_IV)
    batch = h.shape[:-1]
    a = h[..., 0:4]
    b = h[..., 4:8]
    c = jnp.broadcast_to(iv[0:4], batch + (4,))
    d_const = np.array(
        [
            _BLAKE2S_IV[4] ^ np.uint32(t & 0xFFFFFFFF),
            _BLAKE2S_IV[5] ^ np.uint32((t >> 32) & 0xFFFFFFFF),
            _BLAKE2S_IV[6] ^ (np.uint32(0xFFFFFFFF) if last else np.uint32(0)),
            _BLAKE2S_IV[7],
        ],
        dtype=np.uint32,
    )
    d = jnp.broadcast_to(jnp.asarray(d_const), batch + (4,))

    for r in range(10):
        # column step
        mx = m[..., _MSG_IDX[r, 0]]
        my = m[..., _MSG_IDX[r, 1]]
        a, b, c, d = _g_vec(a, b, c, d, mx, my)
        # diagonalize: b <<< 1, c <<< 2, d <<< 3 (lane rotation)
        b = jnp.roll(b, -1, axis=-1)
        c = jnp.roll(c, -2, axis=-1)
        d = jnp.roll(d, -3, axis=-1)
        mx = m[..., _MSG_IDX[r, 2]]
        my = m[..., _MSG_IDX[r, 3]]
        a, b, c, d = _g_vec(a, b, c, d, mx, my)
        # un-diagonalize
        b = jnp.roll(b, 1, axis=-1)
        c = jnp.roll(c, 2, axis=-1)
        d = jnp.roll(d, 3, axis=-1)

    h_lo = h[..., 0:4] ^ a ^ c
    h_hi = h[..., 4:8] ^ b ^ d
    return jnp.concatenate([h_lo, h_hi], axis=-1)


def bytes_to_words_u32(data_u8: jnp.ndarray, nwords: int) -> jnp.ndarray:
    """uint8[..., 4*nwords] (LE) -> uint32[..., nwords]."""
    b = data_u8.astype(jnp.uint32).reshape(data_u8.shape[:-1] + (nwords, 4))
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


def words_to_bytes_u8(words: jnp.ndarray) -> jnp.ndarray:
    """uint32[..., W] -> uint8[..., 4W] (LE)."""
    w = words[..., None]
    parts = jnp.concatenate(
        [w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24) & 0xFF], axis=-1
    )
    return parts.reshape(words.shape[:-1] + (4 * words.shape[-1],)).astype(jnp.uint8)


def blake2s(data_u8: jnp.ndarray) -> jnp.ndarray:
    """Blake2s-256 of uint8[..., N] (static N) -> uint32[..., 8] digest words.

    Unkeyed, 32-byte digest: h0 ^= 0x01010020. Batched over leading dims.
    """
    nbytes = data_u8.shape[-1]
    batch = data_u8.shape[:-1]
    nblocks = max(1, -(-nbytes // 64))
    pad = nblocks * 64 - nbytes
    if pad:
        data_u8 = jnp.concatenate(
            [data_u8, jnp.zeros(batch + (pad,), jnp.uint8)], axis=-1
        )
    m_words = bytes_to_words_u32(data_u8, nblocks * 16)
    m_blocks = m_words.reshape(batch + (nblocks, 16))

    h0 = _BLAKE2S_IV.copy()
    h0[0] ^= np.uint32(0x01010020)  # digest_len=32, fanout=depth=1
    h = jnp.broadcast_to(jnp.asarray(h0), batch + (8,))

    if nblocks == 1:
        return _blake2s_compress(h, m_blocks[..., 0, :], t=nbytes, last=True)

    # Static per-block t/last; scan would force dynamic t — use scan for the
    # uniform middle blocks whenever there is more than one of them, so the
    # ~700-op compression body is traced once per absorb site.
    if nblocks <= 2:
        for i in range(nblocks - 1):
            h = _blake2s_compress(h, m_blocks[..., i, :], t=(i + 1) * 64, last=False)
    else:
        mid = jnp.moveaxis(m_blocks[..., : nblocks - 1, :], -2, 0)  # [nb-1, ..., 16]
        # Byte counters stay far below 2^32 for transcript absorbs (KBs), so
        # the high counter word is a constant 0 — keeps the whole kernel
        # x64-free (x64 is disabled; uint64 would silently truncate anyway).
        ts = jnp.asarray(np.arange(1, nblocks, dtype=np.uint32) * 64)

        def body(hc, inp):
            mb, tcnt = inp
            iv = jnp.asarray(_BLAKE2S_IV)
            batch_l = hc.shape[:-1]
            a = hc[..., 0:4]
            b = hc[..., 4:8]
            c = jnp.broadcast_to(iv[0:4], batch_l + (4,))
            t_lo = tcnt.astype(jnp.uint32)
            t_hi = jnp.uint32(0)
            d = jnp.broadcast_to(
                jnp.stack([iv[4] ^ t_lo, iv[5] ^ t_hi, iv[6], iv[7]], axis=-1),
                batch_l + (4,),
            )
            for r in range(10):
                mx = mb[..., _MSG_IDX[r, 0]]
                my = mb[..., _MSG_IDX[r, 1]]
                a, b, c, d = _g_vec(a, b, c, d, mx, my)
                b = jnp.roll(b, -1, axis=-1)
                c = jnp.roll(c, -2, axis=-1)
                d = jnp.roll(d, -3, axis=-1)
                mx = mb[..., _MSG_IDX[r, 2]]
                my = mb[..., _MSG_IDX[r, 3]]
                a, b, c, d = _g_vec(a, b, c, d, mx, my)
                b = jnp.roll(b, 1, axis=-1)
                c = jnp.roll(c, 2, axis=-1)
                d = jnp.roll(d, 3, axis=-1)
            h_lo = hc[..., 0:4] ^ a ^ c
            h_hi = hc[..., 4:8] ^ b ^ d
            return jnp.concatenate([h_lo, h_hi], axis=-1), None

        h, _ = jax.lax.scan(body, h, (mid, ts))
    return _blake2s_compress(h, m_blocks[..., nblocks - 1, :], t=nbytes, last=True)


def blake2s_bytes(data_u8: jnp.ndarray) -> jnp.ndarray:
    """Blake2s digest as uint8[..., 32]."""
    return words_to_bytes_u8(blake2s(data_u8))


# ---------------------------------------------------------------------------
# ChaCha20 (rand_chacha::ChaChaRng word stream)
# ---------------------------------------------------------------------------

_CHACHA_CONST = np.array(
    [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574], dtype=np.uint32
)


def chacha20_block(key_words: jnp.ndarray, counter: jnp.ndarray) -> jnp.ndarray:
    """One ChaCha20 block: key uint32[..., 8], counter uint32[...] ->
    uint32[..., 16] output words (64-bit block counter @ words 12-13, nonce 0,
    matching `rand_chacha::ChaChaRng` / crypto/transcript.py). Transcript
    streams draw far fewer than 2^36 bytes, so the high counter word is a
    constant 0 (keeps the kernel x64-free)."""
    batch = key_words.shape[:-1]
    c_lo = counter.astype(jnp.uint32)
    zeros = jnp.zeros(batch, jnp.uint32)
    state = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(_CHACHA_CONST), batch + (4,)),
            key_words,
            jnp.stack([jnp.broadcast_to(c_lo, batch), zeros, zeros, zeros], axis=-1),
        ],
        axis=-1,
    )  # [..., 16]

    a = state[..., 0:4]
    b = state[..., 4:8]
    c = state[..., 8:12]
    d = state[..., 12:16]

    def qr(a, b, c, d):
        a = a + b
        d = _rotl(d ^ a, 16)
        c = c + d
        b = _rotl(b ^ c, 12)
        a = a + b
        d = _rotl(d ^ a, 8)
        c = c + d
        b = _rotl(b ^ c, 7)
        return a, b, c, d

    for _ in range(10):
        a, b, c, d = qr(a, b, c, d)  # column round (4 lanes elementwise)
        b = jnp.roll(b, -1, axis=-1)
        c = jnp.roll(c, -2, axis=-1)
        d = jnp.roll(d, -3, axis=-1)
        a, b, c, d = qr(a, b, c, d)  # diagonal round
        b = jnp.roll(b, 1, axis=-1)
        c = jnp.roll(c, 2, axis=-1)
        d = jnp.roll(d, 3, axis=-1)

    out = jnp.concatenate([a, b, c, d], axis=-1) + state
    return out


def chacha20_words(key_words: jnp.ndarray, start_word: jnp.ndarray, nwords: int, align: int = 1):
    """`nwords` (static) consecutive keystream words starting at stream
    position `start_word` (uint32[...], word-granular): uint32[..., nwords].

    Computes ceil-covering blocks and gathers — recomputing a partially
    consumed block is cheaper than carrying buffer state through jit.
    `align`: static guarantee that start_word % align == 0 (the transcript's
    field draws are nwords-aligned), which tightens the block count — e.g.
    8-word draws at 8-word alignment need ONE block, not two.
    """
    batch = key_words.shape[:-1]
    max_off = 0 if align >= 16 else (16 - align if 16 % align == 0 and align > 1 else 15)
    nblocks = (max_off + nwords + 15) // 16
    first_block = (start_word // 16).astype(jnp.uint32)
    offs = (start_word % 16).astype(jnp.int32)
    blocks = []
    for i in range(nblocks):
        blocks.append(chacha20_block(key_words, first_block + jnp.uint32(i)))
    stream = jnp.concatenate(blocks, axis=-1)  # [..., 16*nblocks]
    idx = offs[..., None] + jnp.arange(nwords, dtype=jnp.int32)
    return jnp.take_along_axis(stream, idx.astype(jnp.int32), axis=-1)
