"""Cross-implementation golden-vector certification against the Rust reference.

The vectors are produced by `tools/vectors` (a pinned arkworks-0.3 harness,
one `cargo run --release` on any Rust host — see tools/vectors/README.md).
Until `tests/vectors/` is populated every test here auto-skips, so the suite
is green both before and after certification is activated.

Certifies (docs/INTEROP.md):
- `fs_rng.json`      -> `ark_marlin::rng::FiatShamirRng<Blake2s>` bit-exactness
                        (SURVEY §2.2 E13, used at `mod.rs:9,139-164`)
- `serialize.json`   -> arkworks ToBytes / CanonicalSerialize layouts AND our
                        scalar-mul results vs `ark-ec` (E14/E15/E16)
- `protocol.json`    -> the ElGamal mask/remask/reveal/unmask algebra
                        (`mod.rs:182-378`) coordinate-for-coordinate
- `schedule_probe.json` -> whether our clean-room sigma absorb schedules match
                        the unvendored proof-essentials crate (xfail-tolerant:
                        a divergence is documented, not a bug)
"""

import json
import os

import pytest

from mental_poker_tpu.crypto import serialize as ser
from mental_poker_tpu.crypto.transcript import FiatShamirRng
from mental_poker_tpu.ops.field import BLS12_377_R, STARK_R
from mental_poker_tpu.utils.host_curve import BLS12_377_G1, STARK

VEC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vectors")


def _vec(name: str) -> dict:
    path = os.path.join(VEC_DIR, name)
    if not os.path.exists(path):
        pytest.skip(
            f"golden vectors not generated ({name} absent) — "
            "run `cargo run --release` in tools/vectors on a Rust host"
        )
    with open(path) as f:
        return json.load(f)


def _le_int(h: str) -> int:
    return int.from_bytes(bytes.fromhex(h), "little")


def _pt_from_tobytes(h: str, curve):
    """Parse the arkworks ToBytes affine layout x || y || infinity(u8)."""
    nb = ser.repr_bytes(curve.p.bit_length())
    b = bytes.fromhex(h)
    assert len(b) == 2 * nb + 1, (len(b), nb)
    if b[-1]:
        return curve.identity
    x = int.from_bytes(b[:nb], "little")
    y = int.from_bytes(b[nb : 2 * nb], "little")
    return (x, y, False)


# ---------------------------------------------------------------------------
# fs_rng.json
# ---------------------------------------------------------------------------


def test_fs_rng_word_streams():
    for e in _vec("fs_rng.json")["entries"]:
        seed = bytes.fromhex(e["seed_input"])
        r = FiatShamirRng(seed)
        got = [r.rng.next_u32() for _ in range(len(e["u32s"]))]
        assert got == [int(v) for v in e["u32s"]], e["label"]
        r = FiatShamirRng(seed)
        got64 = [r.rng.next_u64() for _ in range(len(e["u64s"]))]
        assert got64 == [int(v) for v in e["u64s"]], e["label"]


def test_fs_rng_field_draws():
    for e in _vec("fs_rng.json")["entries"]:
        seed = bytes.fromhex(e["seed_input"])
        r = FiatShamirRng(seed)
        got = [r.sample_field(STARK_R) for _ in e["stark_fr"]]
        want = [_le_int(h) for h in e["stark_fr"]]
        assert got == want, f"{e['label']}: stark_fr challenge stream mismatch"
        r = FiatShamirRng(seed)
        got = [r.sample_field(BLS12_377_R) for _ in e["bls377_fr"]]
        want = [_le_int(h) for h in e["bls377_fr"]]
        assert got == want, f"{e['label']}: bls377_fr challenge stream mismatch"


def test_fs_rng_absorb_reseeding():
    for e in _vec("fs_rng.json")["entries"]:
        r = FiatShamirRng(bytes.fromhex(e["seed_input"]))
        pre = [r.sample_field(STARK_R) for _ in e["stark_fr_pre_absorb"]]
        assert pre == [_le_int(h) for h in e["stark_fr_pre_absorb"]], e["label"]
        r.absorb(bytes.fromhex(e["absorb_bytes"]))
        post = [r.sample_field(STARK_R) for _ in e["stark_fr_post_absorb"]]
        assert post == [_le_int(h) for h in e["stark_fr_post_absorb"]], e["label"]


# ---------------------------------------------------------------------------
# serialize.json
# ---------------------------------------------------------------------------

_CURVES = {"stark": (STARK, STARK_R), "bls377_g1": (BLS12_377_G1, BLS12_377_R)}
_POINT_SCALARS = {
    "g": 1,
    "2g": 2,
    "5g": 5,
    "2e128_g": 1 << 128,
    "minus_g": -1,
    "identity": None,
}


def _split_label(label: str):
    for prefix in sorted(_CURVES, key=len, reverse=True):
        if label.startswith(prefix + "_"):
            return prefix, label[len(prefix) + 1 :]
    raise AssertionError(f"unknown vector label {label}")


def test_serialize_points_and_scalar_mul():
    seen = 0
    for e in _vec("serialize.json")["entries"]:
        prefix, kind = _split_label(e["label"])
        if kind not in _POINT_SCALARS:
            continue
        curve, order = _CURVES[prefix]
        k = _POINT_SCALARS[kind]
        if k is None:
            P = curve.identity
        else:
            P = curve.mul(k % order, curve.generator)
        assert ser.point_to_bytes(P, curve).hex() == e["to_bytes"], e["label"]
        assert (
            ser.point_to_bytes_compressed(P, curve).hex() == e["compressed"]
        ), e["label"]
        # decompression round-trip against the Rust bytes
        Q = ser.point_from_bytes_compressed(bytes.fromhex(e["compressed"]), curve)
        assert Q == P, e["label"]
        seen += 1
    assert seen >= 12  # both curves, all six point kinds


def test_serialize_field_elements():
    field_vals = {"zero": 0, "one": 1, "two": 2}
    moduli = {"stark_fr": STARK_R, "stark_fq": STARK.p, "bls377_fr": BLS12_377_R}
    seen = 0
    for e in _vec("serialize.json")["entries"]:
        parts = e["label"].rsplit("_", 1)
        if len(parts) != 2:
            continue
        prefix, kind = parts
        if prefix.endswith("minus"):  # *_minus_one
            prefix, kind = prefix[: -len("_minus")], "minus_one"
        if prefix not in moduli or kind not in (*field_vals, "minus_one"):
            continue
        q = moduli[prefix]
        v = (q - 1) if kind == "minus_one" else field_vals[kind]
        assert ser.field_to_bytes(v, q.bit_length()).hex() == e["to_bytes"], e["label"]
        # CanonicalSerialize of a field element == its LE repr bytes
        assert e["compressed"] == e["to_bytes"], e["label"]
        seen += 1
    assert seen >= 12


# ---------------------------------------------------------------------------
# protocol.json — ElGamal / protocol algebra, coordinate-for-coordinate
# ---------------------------------------------------------------------------


def test_protocol_elgamal_algebra():
    v = _vec("protocol.json")
    cv = STARK
    g = _pt_from_tobytes(v["enc_generator"], cv)
    assert cv.is_on_curve(g)

    pks, sks = [], []
    for p in v["players"]:
        pk = _pt_from_tobytes(p["pk"], cv)
        sk = _le_int(p["sk"])
        # el_gamal keygen convention: pk = sk * generator (pinned by the
        # reveal/unmask algebra, reveal.rs:14-18)
        assert cv.mul(sk, g) == pk, "pk != sk*g — keygen convention mismatch"
        pks.append(pk)
        sks.append(sk)

    agg = _pt_from_tobytes(v["aggregate_key"], cv)
    acc = cv.identity
    for pk in pks:
        acc = cv.add(acc, pk)
    assert acc == agg, "aggregate key != sum of player keys (mod.rs:167-180)"

    # mask: c0 = r*g, c1 = card + r*agg (masking.rs:10-20)
    card = _pt_from_tobytes(v["card"], cv)
    r = _le_int(v["mask_r"])
    c0 = _pt_from_tobytes(v["masked_c0"], cv)
    c1 = _pt_from_tobytes(v["masked_c1"], cv)
    assert cv.mul(r, g) == c0, "masked c0 != r*g"
    assert cv.add(card, cv.mul(r, agg)) == c1, "masked c1 != card + r*agg"

    # remask: adds an encryption of zero (remasking.rs:15-21)
    alpha = _le_int(v["remask_alpha"])
    d0 = _pt_from_tobytes(v["remasked_c0"], cv)
    d1 = _pt_from_tobytes(v["remasked_c1"], cv)
    assert cv.add(c0, cv.mul(alpha, g)) == d0, "remasked c0 mismatch"
    assert cv.add(c1, cv.mul(alpha, agg)) == d1, "remasked c1 mismatch"

    # reveal tokens: token_p = sk_p * d0 (mod.rs:307-308)
    tok_sum = cv.identity
    for p, sk in zip(v["reveal_tokens"], sks):
        tok = _pt_from_tobytes(p["token"], cv)
        assert cv.mul(sk, d0) == tok, "reveal token != sk*c0"
        tok_sum = cv.add(tok_sum, tok)

    # unmask: -sum(tokens) + d1 == original card (reveal.rs:14-18)
    opened = _pt_from_tobytes(v["opened_card"], cv)
    assert cv.add(cv.neg(tok_sum), d1) == opened == card, "unmask algebra mismatch"


# ---------------------------------------------------------------------------
# schedule_probe.json — sigma absorb-schedule comparison (xfail-tolerant)
# ---------------------------------------------------------------------------


def _parse_sigma_proof(h: str, curve, n_points: int):
    """Parse CanonicalSerialize bytes as n_points compressed points + scalar."""
    b = bytes.fromhex(h)
    nb = ser.repr_bytes(curve.p.bit_length())
    sb = ser.repr_bytes(curve.order.bit_length())
    assert len(b) == n_points * nb + sb, (len(b), nb, sb)
    pts = [
        ser.point_from_bytes_compressed(b[i * nb : (i + 1) * nb], curve)
        for i in range(n_points)
    ]
    s = int.from_bytes(b[n_points * nb :], "little")
    return pts, s


def test_schedule_probe_schnorr():
    """Replay OUR Schnorr transcript schedule over the Rust proof. A pass
    means the clean-room schedule happens to match proof-essentials; an xfail
    documents the (expected, see docs/INTEROP.md) divergence precisely."""
    v = _vec("schedule_probe.json")["schnorr"]
    cv = STARK
    g = _pt_from_tobytes(v["g"], cv)
    pk = _pt_from_tobytes(v["pk"], cv)
    (t,), s = _parse_sigma_proof(v["proof"], cv, 1)
    # our schedule (crypto/sigma.py): absorb(g || pk || t), draw c
    fs = FiatShamirRng(bytes.fromhex(v["seed_input"]))
    fs.absorb(
        ser.point_to_bytes(g, cv) + ser.point_to_bytes(pk, cv) + ser.point_to_bytes(t, cv)
    )
    c = fs.sample_field(cv.order)
    lhs = cv.mul(s, g)
    rhs = cv.add(t, cv.mul(c, pk))
    if lhs != rhs:
        pytest.xfail(
            "proof-essentials' Schnorr absorb schedule differs from our "
            "clean-room schedule (documented in docs/INTEROP.md)"
        )


def test_schedule_probe_chaum_pedersen():
    v = _vec("schedule_probe.json")["chaum_pedersen"]
    cv = STARK
    g = _pt_from_tobytes(v["g"], cv)
    h = _pt_from_tobytes(v["h"], cv)
    a = _pt_from_tobytes(v["a"], cv)
    b = _pt_from_tobytes(v["b"], cv)
    (tg, th), s = _parse_sigma_proof(v["proof"], cv, 2)
    fs = FiatShamirRng(bytes.fromhex(v["seed_input"]))
    fs.absorb(
        ser.point_to_bytes(g, cv)
        + ser.point_to_bytes(h, cv)
        + ser.point_to_bytes(a, cv)
        + ser.point_to_bytes(b, cv)
        + ser.point_to_bytes(tg, cv)
        + ser.point_to_bytes(th, cv)
    )
    c = fs.sample_field(cv.order)
    ok = cv.mul(s, g) == cv.add(tg, cv.mul(c, a)) and cv.mul(s, h) == cv.add(
        th, cv.mul(c, b)
    )
    if not ok:
        pytest.xfail(
            "proof-essentials' Chaum-Pedersen absorb schedule differs from "
            "our clean-room schedule (documented in docs/INTEROP.md)"
        )
