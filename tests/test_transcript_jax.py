"""Device transcript == host transcript, bit-for-bit.

The device-resident prover is only interoperable with the host/reference
transcript if absorb digests, keystream positions, and rejection-sampled
field draws match exactly — including transcripts that reject one or more
draws. Also pins device point serialization == host serialize.point_to_bytes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mental_poker_tpu.crypto import elgamal, serialize, serialize_jax, transcript_jax
from mental_poker_tpu.crypto.transcript import FiatShamirRng
from mental_poker_tpu.ops import curve as curve_mod
from mental_poker_tpu.ops.field import stark_fr
from mental_poker_tpu.utils.rand import GameRng


def test_sample_field_matches_host_single():
    fld = stark_fr()
    seed = b"Shuffle Proof"
    host = FiatShamirRng(seed)
    st = transcript_jax.init(seed)

    fn = jax.jit(lambda s: transcript_jax.sample_fields(s, fld, 6))
    st, vals = fn(st)
    host_vals = [host.sample_field(fld.p) for _ in range(6)]
    dev_vals = [fld.to_int(np.asarray(v)) for v in np.asarray(vals)]
    assert dev_vals == host_vals


def test_absorb_then_sample_matches_host():
    fld = stark_fr()
    seed = b"Masking Proof"
    data1 = bytes(range(100))
    data2 = b"proof bytes" * 13

    host = FiatShamirRng(seed)
    host.absorb(data1)
    h1 = host.sample_field(fld.p)
    host.absorb(data2)
    h2 = host.sample_field(fld.p)
    h3 = host.sample_field(fld.p)

    def run(d1, d2):
        st = transcript_jax.init(seed)
        st = transcript_jax.absorb(st, d1)
        st, v1 = transcript_jax.sample_field(st, fld)
        st = transcript_jax.absorb(st, d2)
        st, v2 = transcript_jax.sample_field(st, fld)
        st, v3 = transcript_jax.sample_field(st, fld)
        return v1, v2, v3

    v1, v2, v3 = jax.jit(run)(
        jnp.asarray(np.frombuffer(data1, np.uint8)),
        jnp.asarray(np.frombuffer(data2, np.uint8)),
    )
    assert [fld.to_int(np.asarray(v)) for v in (v1, v2, v3)] == [h1, h2, h3]


def test_batched_transcripts_independent():
    """A [B]-batch of transcripts with different absorbs == B host runs
    (exercises per-lane rejection bookkeeping)."""
    fld = stark_fr()
    seed = b"Reveal Proof"
    B = 8
    rng = np.random.default_rng(3)
    datas = rng.integers(0, 256, size=(B, 64), dtype=np.uint8)

    def run(d):
        st = transcript_jax.init(seed, (B,))
        st = transcript_jax.absorb(st, d)
        st, v1 = transcript_jax.sample_field(st, fld)
        st, v2 = transcript_jax.sample_field(st, fld)
        return v1, v2

    v1, v2 = jax.jit(run)(jnp.asarray(datas))
    for b in range(B):
        host = FiatShamirRng(seed)
        host.absorb(datas[b].tobytes())
        assert fld.to_int(np.asarray(v1[b])) == host.sample_field(fld.p)
        assert fld.to_int(np.asarray(v2[b])) == host.sample_field(fld.p)


def test_point_bytes_matches_host():
    cv = curve_mod.stark_curve()
    rng = GameRng(99)
    pts_host = [cv.host.rand_point(rng.rng) for _ in range(5)] + [cv.host.identity]
    P = cv.from_host_points(pts_host)
    blob = np.asarray(jax.jit(lambda p: serialize_jax.points_blob(cv, p))(P))
    expect = b"".join(serialize.point_to_bytes(p, cv.host) for p in pts_host)
    assert bytes(blob) == expect


def test_cipher_blob_matches_host():
    cv = curve_mod.stark_curve()
    rng = GameRng(100)
    cts = elgamal.rand_ciphertexts(cv, rng, 4)
    blob = np.asarray(
        jax.jit(lambda a, b: serialize_jax.cipher_blob(cv, a, b))(cts.c0, cts.c1)
    )
    h0 = cv.to_host_points(cts.c0)
    h1 = cv.to_host_points(cts.c1)
    expect = b"".join(
        serialize.point_to_bytes(p0, cv.host) + serialize.point_to_bytes(p1, cv.host)
        for p0, p1 in zip(h0, h1)
    )
    assert bytes(blob) == expect
