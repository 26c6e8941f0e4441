//! Golden-vector dump for mental-poker-tpu interop certification.
//!
//! One `cargo run --release` on any Rust host writes JSON vector files into
//! `tests/vectors/`; the Python suite's `tests/test_vectors.py` picks them up
//! automatically (it auto-skips while the directory is empty). See
//! `tools/vectors/README.md` and `docs/INTEROP.md` for what each file
//! certifies.
//!
//! Files written:
//!   fs_rng.json          ark_marlin::FiatShamirRng<Blake2s> streams (u32/u64
//!                        words, Stark-Fr and BLS377-Fr draws, absorb replay)
//!                        — certifies the transcript core (SURVEY E13).
//!   serialize.json       ToBytes + CanonicalSerialize(compressed) layouts for
//!                        field elements, scalars, curve points, and fixed
//!                        scalar-mul results on both curves (E14/E16 + L1).
//!   protocol.json        A full key-ceremony -> mask -> remask -> reveal ->
//!                        unmask flow on the Stark curve with every scalar and
//!                        point dumped — certifies the ElGamal/protocol
//!                        algebra (E3, mod.rs:182-378) byte-for-byte.
//!   schedule_probe.json  proof-essentials sigma proofs plus post-prove /
//!                        post-verify FiatShamirRng probe draws — measures
//!                        whether this framework's (clean-room) absorb
//!                        schedule matches the unvendored crate's.

use std::env;
use std::fs;
use std::path::PathBuf;

use ark_ec::{AffineCurve, ProjectiveCurve};
use ark_ff::{to_bytes, PrimeField, ToBytes, UniformRand};
use ark_marlin::rng::FiatShamirRng;
use ark_serialize::CanonicalSerialize;
use ark_std::rand::RngCore;
use ark_std::{One, Zero};
use blake2::Blake2s;
use rand::rngs::StdRng;
use rand::SeedableRng;

use barnett_smart_card_protocol::discrete_log_cards::{Card, DLCards, Parameters};
use barnett_smart_card_protocol::BarnettSmartProtocol;
use proof_essentials::homomorphic_encryption::{el_gamal::ElGamal, HomomorphicEncryptionScheme};
use proof_essentials::vector_commitment::{
    pedersen::PedersenCommitment, HomomorphicCommitmentScheme,
};
use proof_essentials::zkp::{
    proofs::{chaum_pedersen_dl_equality, schnorr_identification},
    ArgumentOfKnowledge,
};

type Curve = starknet_curve::Projective;
type Scalar = starknet_curve::Fr;
type CardProtocol = DLCards<Curve>;

/// arkworks `ToBytes` hex (little-endian canonical repr).
fn fb<T: ToBytes>(x: &T) -> String {
    hex::encode(to_bytes![x].unwrap())
}

/// arkworks `CanonicalSerialize` (compressed) hex.
fn cs<T: CanonicalSerialize>(x: &T) -> String {
    let mut v = Vec::new();
    x.serialize(&mut v).unwrap();
    hex::encode(v)
}

fn jstr_list(items: &[String]) -> String {
    let quoted: Vec<String> = items.iter().map(|s| format!("\"{}\"", s)).collect();
    format!("[{}]", quoted.join(", "))
}

// ---------------------------------------------------------------------------
// fs_rng.json
// ---------------------------------------------------------------------------

fn dump_fs_rng() -> String {
    // The five protocol domain-separation seeds (mod.rs:80-84) plus a
    // composite seed matching prove_key_ownership's
    // to_bytes![KEY_OWN_RNG_SEED, player_public_info] (mod.rs:139-140).
    let mut seeds: Vec<(&str, Vec<u8>)> = vec![
        ("key_ownership", b"Key Ownership Proof".to_vec()),
        ("masking", b"Masking Proof".to_vec()),
        ("remasking", b"Remasking Proof".to_vec()),
        ("reveal", b"Reveal Proof".to_vec()),
        ("shuffle", b"Shuffle Proof".to_vec()),
    ];
    let composite = to_bytes![b"Key Ownership Proof".to_vec(), b"Alice".to_vec()].unwrap();
    seeds.push(("key_ownership_alice", composite));

    let mut entries = Vec::new();
    for (label, seed) in &seeds {
        let mut r = FiatShamirRng::<Blake2s>::from_seed(seed);
        let u32s: Vec<String> = (0..8).map(|_| r.next_u32().to_string()).collect();

        let mut r = FiatShamirRng::<Blake2s>::from_seed(seed);
        let u64s: Vec<String> = (0..4).map(|_| r.next_u64().to_string()).collect();

        let mut r = FiatShamirRng::<Blake2s>::from_seed(seed);
        let stark_fr: Vec<String> = (0..4).map(|_| fb(&Scalar::rand(&mut r))).collect();

        let mut r = FiatShamirRng::<Blake2s>::from_seed(seed);
        let bls_fr: Vec<String> = (0..4)
            .map(|_| fb(&ark_bls12_377::Fr::rand(&mut r)))
            .collect();

        // absorb replay: 2 draws, absorb fixed bytes, 2 more draws
        let mut r = FiatShamirRng::<Blake2s>::from_seed(seed);
        let pre: Vec<String> = (0..2).map(|_| fb(&Scalar::rand(&mut r))).collect();
        r.absorb(&b"mptpu absorb test".to_vec());
        let post: Vec<String> = (0..2).map(|_| fb(&Scalar::rand(&mut r))).collect();

        entries.push(format!(
            concat!(
                "  {{\"label\": \"{}\", \"seed_input\": \"{}\",\n",
                "   \"u32s\": {}, \"u64s\": {},\n",
                "   \"stark_fr\": {}, \"bls377_fr\": {},\n",
                "   \"absorb_bytes\": \"{}\", \"stark_fr_pre_absorb\": {}, ",
                "\"stark_fr_post_absorb\": {}}}"
            ),
            label,
            hex::encode(seed),
            jstr_list(&u32s),
            jstr_list(&u64s),
            jstr_list(&stark_fr),
            jstr_list(&bls_fr),
            hex::encode(b"mptpu absorb test"),
            jstr_list(&pre),
            jstr_list(&post),
        ));
    }
    format!("{{\"entries\": [\n{}\n]}}\n", entries.join(",\n"))
}

// ---------------------------------------------------------------------------
// serialize.json
// ---------------------------------------------------------------------------

fn point_entry<A: AffineCurve>(label: &str, p: &A) -> String {
    format!(
        "  {{\"label\": \"{}\", \"to_bytes\": \"{}\", \"compressed\": \"{}\"}}",
        label,
        fb(p),
        cs(p)
    )
}

fn curve_points<P: ProjectiveCurve>(prefix: &str) -> Vec<String> {
    let g = P::prime_subgroup_generator();
    let fr_minus_one = -P::ScalarField::one();
    let two = P::ScalarField::one() + P::ScalarField::one();
    let five = two + two + P::ScalarField::one();
    // 2^128 pins the full scalar-mul double-and-add chain
    let big = two.pow(&[128u64]);
    vec![
        point_entry(&format!("{}_g", prefix), &g.into_affine()),
        point_entry(&format!("{}_2g", prefix), &g.mul(two.into_repr()).into_affine()),
        point_entry(&format!("{}_5g", prefix), &g.mul(five.into_repr()).into_affine()),
        point_entry(
            &format!("{}_2e128_g", prefix),
            &g.mul(big.into_repr()).into_affine(),
        ),
        point_entry(
            &format!("{}_minus_g", prefix),
            &g.mul(fr_minus_one.into_repr()).into_affine(),
        ),
        point_entry(&format!("{}_identity", prefix), &P::Affine::zero()),
    ]
}

fn scalar_entries<F: PrimeField>(prefix: &str) -> Vec<String> {
    let vals = vec![
        ("zero", F::zero()),
        ("one", F::one()),
        ("two", F::one() + F::one()),
        ("minus_one", -F::one()),
    ];
    vals.iter()
        .map(|(l, v)| {
            format!(
                "  {{\"label\": \"{}_{}\", \"to_bytes\": \"{}\", \"compressed\": \"{}\"}}",
                prefix,
                l,
                fb(v),
                cs(v)
            )
        })
        .collect()
}

fn dump_serialize() -> String {
    let mut entries = Vec::new();
    entries.extend(curve_points::<Curve>("stark"));
    entries.extend(curve_points::<ark_bls12_377::G1Projective>("bls377_g1"));
    entries.extend(scalar_entries::<Scalar>("stark_fr"));
    entries.extend(scalar_entries::<starknet_curve::Fq>("stark_fq"));
    entries.extend(scalar_entries::<ark_bls12_377::Fr>("bls377_fr"));
    format!("{{\"entries\": [\n{}\n]}}\n", entries.join(",\n"))
}

// ---------------------------------------------------------------------------
// protocol.json — full flow with every scalar dumped (algebra certification)
// ---------------------------------------------------------------------------

fn dump_protocol() -> String {
    let mut rng = StdRng::seed_from_u64(0x6d70_7470_7534_0001); // "mptpu4"
    let (m, n) = (2usize, 4usize);

    let enc_parameters = ElGamal::<Curve>::setup(&mut rng).unwrap();
    let enc_generator = enc_parameters.generator;
    let commit_parameters = PedersenCommitment::<Curve>::setup(&mut rng, n);
    let generator = ElGamal::<Curve>::generator(&mut rng).unwrap();
    let pp = Parameters::new(m, n, enc_parameters, commit_parameters, generator);

    // --- key ceremony: 3 players ---
    let names: Vec<Vec<u8>> = vec![b"Alice".to_vec(), b"Bob".to_vec(), b"Charlie".to_vec()];
    let mut sks = Vec::new();
    let mut key_proof_info = Vec::new();
    let mut player_json = Vec::new();
    for name in &names {
        let (pk, sk) = CardProtocol::player_keygen(&mut rng, &pp).unwrap();
        let proof = CardProtocol::prove_key_ownership(&mut rng, &pp, &pk, &sk, name).unwrap();
        CardProtocol::verify_key_ownership(&pp, &pk, name, &proof).unwrap();
        player_json.push(format!(
            concat!(
                "    {{\"info\": \"{}\", \"pk\": \"{}\", \"sk\": \"{}\", ",
                "\"key_ownership_proof\": \"{}\"}}"
            ),
            hex::encode(name),
            fb(&pk),
            fb(&sk),
            cs(&proof)
        ));
        sks.push(sk);
        key_proof_info.push((pk, proof, name.clone()));
    }
    let agg = CardProtocol::compute_aggregate_key(&pp, &key_proof_info).unwrap();

    // --- mask ---
    let card = Card::<Curve>::rand(&mut rng);
    let r = Scalar::rand(&mut rng);
    let (masked, mask_proof) = CardProtocol::mask(&mut rng, &pp, &agg, &card, &r).unwrap();
    CardProtocol::verify_mask(&pp, &agg, &card, &masked, &mask_proof).unwrap();

    // --- remask ---
    let alpha = Scalar::rand(&mut rng);
    let (remasked, remask_proof) =
        CardProtocol::remask(&mut rng, &pp, &agg, &masked, &alpha).unwrap();
    CardProtocol::verify_remask(&pp, &agg, &masked, &remasked, &remask_proof).unwrap();

    // --- reveal tokens + unmask ---
    let mut decryption_key = Vec::new();
    let mut token_json = Vec::new();
    for ((pk, _, _), sk) in key_proof_info.iter().zip(sks.iter()) {
        let (token, proof) =
            CardProtocol::compute_reveal_token(&mut rng, &pp, sk, pk, &remasked).unwrap();
        CardProtocol::verify_reveal(&pp, pk, &token, &remasked, &proof).unwrap();
        token_json.push(format!(
            "    {{\"pk\": \"{}\", \"token\": \"{}\", \"reveal_proof\": \"{}\"}}",
            fb(pk),
            fb(&token),
            cs(&proof)
        ));
        decryption_key.push((token, proof, *pk));
    }
    let opened = CardProtocol::unmask(&pp, &decryption_key, &remasked).unwrap();
    assert_eq!(
        to_bytes![opened].unwrap(),
        to_bytes![card].unwrap(),
        "unmask must recover the original card"
    );

    format!(
        concat!(
            "{{\n",
            "  \"curve\": \"stark\", \"m\": {}, \"n\": {},\n",
            "  \"enc_generator\": \"{}\",\n",
            "  \"players\": [\n{}\n  ],\n",
            "  \"aggregate_key\": \"{}\",\n",
            "  \"card\": \"{}\",\n",
            "  \"mask_r\": \"{}\",\n",
            "  \"masked_c0\": \"{}\", \"masked_c1\": \"{}\",\n",
            "  \"mask_proof\": \"{}\",\n",
            "  \"remask_alpha\": \"{}\",\n",
            "  \"remasked_c0\": \"{}\", \"remasked_c1\": \"{}\",\n",
            "  \"remask_proof\": \"{}\",\n",
            "  \"reveal_tokens\": [\n{}\n  ],\n",
            "  \"opened_card\": \"{}\"\n",
            "}}\n"
        ),
        m,
        n,
        fb(&enc_generator),
        player_json.join(",\n"),
        fb(&agg),
        fb(&card.0),
        fb(&r),
        fb(&masked.0),
        fb(&masked.1),
        cs(&mask_proof),
        fb(&alpha),
        fb(&remasked.0),
        fb(&remasked.1),
        cs(&remask_proof),
        token_json.join(",\n"),
        fb(&opened.0)
    )
}

// ---------------------------------------------------------------------------
// schedule_probe.json — does proof-essentials' absorb schedule match ours?
// ---------------------------------------------------------------------------

fn dump_schedule_probe() -> String {
    let mut rng = StdRng::seed_from_u64(0x6d70_7470_7534_0002);
    let g = Curve::prime_subgroup_generator().into_affine();

    // Schnorr. The pk sign convention (pk = sk*g vs pk = -sk*g) lives in the
    // unvendored crate; probe pk = +sk*g first and fall back to -sk*g if the
    // crate's own verifier rejects it, recording which one held.
    let sk = Scalar::rand(&mut rng);
    let mut pk = g.mul(sk.into_repr()).into_affine();
    let mut pk_is_positive = true;
    let seed = b"mptpu schnorr probe".to_vec();
    let mut fs = FiatShamirRng::<Blake2s>::from_seed(&seed);
    let mut proof =
        schnorr_identification::SchnorrIdentification::prove(&mut rng, &g, &pk, &sk, &mut fs)
            .unwrap();
    let mut probe = fb(&Scalar::rand(&mut fs));
    let mut fs2 = FiatShamirRng::<Blake2s>::from_seed(&seed);
    if schnorr_identification::SchnorrIdentification::verify(&g, &pk, &proof, &mut fs2).is_err() {
        pk_is_positive = false;
        pk = -pk;
        let mut fs = FiatShamirRng::<Blake2s>::from_seed(&seed);
        proof =
            schnorr_identification::SchnorrIdentification::prove(&mut rng, &g, &pk, &sk, &mut fs)
                .unwrap();
        probe = fb(&Scalar::rand(&mut fs));
        let mut fs2 = FiatShamirRng::<Blake2s>::from_seed(&seed);
        schnorr_identification::SchnorrIdentification::verify(&g, &pk, &proof, &mut fs2).unwrap();
    }
    let (schnorr_ok, schnorr_proof_hex, schnorr_probe_prove) = (pk_is_positive, cs(&proof), probe);
    let pk = pk; // final convention-corrected pk, dumped below

    // Chaum-Pedersen: a = w*g, b = w*h
    let h = g.mul(Scalar::rand(&mut rng).into_repr()).into_affine();
    let w = Scalar::rand(&mut rng);
    let a = g.mul(w.into_repr()).into_affine();
    let b = h.mul(w.into_repr()).into_affine();
    let params = chaum_pedersen_dl_equality::Parameters::new(&g, &h);
    let stmt = chaum_pedersen_dl_equality::Statement::new(&a, &b);
    let mut fs = FiatShamirRng::<Blake2s>::from_seed(&b"mptpu cp probe".to_vec());
    let cp_proof =
        chaum_pedersen_dl_equality::DLEquality::prove(&mut rng, &params, &stmt, &w, &mut fs)
            .unwrap();
    let cp_probe_prove = fb(&Scalar::rand(&mut fs));
    let mut fs2 = FiatShamirRng::<Blake2s>::from_seed(&b"mptpu cp probe".to_vec());
    chaum_pedersen_dl_equality::DLEquality::verify(&params, &stmt, &cp_proof, &mut fs2).unwrap();
    let cp_probe_verify = fb(&Scalar::rand(&mut fs2));

    format!(
        concat!(
            "{{\n",
            "  \"schnorr\": {{\"seed_input\": \"{}\", \"g\": \"{}\", \"pk\": \"{}\", ",
            "\"sk\": \"{}\", \"pk_is_positive_skg\": {}, \"proof\": \"{}\", ",
            "\"fr_probe_after_prove\": \"{}\"}},\n",
            "  \"chaum_pedersen\": {{\"seed_input\": \"{}\", \"g\": \"{}\", \"h\": \"{}\", ",
            "\"a\": \"{}\", \"b\": \"{}\", \"w\": \"{}\", \"proof\": \"{}\", ",
            "\"fr_probe_after_prove\": \"{}\", \"fr_probe_after_verify\": \"{}\"}}\n",
            "}}\n"
        ),
        hex::encode(b"mptpu schnorr probe"),
        fb(&g),
        fb(&pk),
        fb(&sk),
        schnorr_ok,
        schnorr_proof_hex,
        schnorr_probe_prove,
        hex::encode(b"mptpu cp probe"),
        fb(&g),
        fb(&h),
        fb(&a),
        fb(&b),
        fb(&w),
        cs(&cp_proof),
        cp_probe_prove,
        cp_probe_verify
    )
}

fn main() {
    let out_dir: PathBuf = env::args()
        .nth(1)
        .map(PathBuf::from)
        .unwrap_or_else(|| PathBuf::from("../../tests/vectors"));
    fs::create_dir_all(&out_dir).unwrap();

    fs::write(out_dir.join("fs_rng.json"), dump_fs_rng()).unwrap();
    println!("wrote fs_rng.json");
    fs::write(out_dir.join("serialize.json"), dump_serialize()).unwrap();
    println!("wrote serialize.json");
    fs::write(out_dir.join("protocol.json"), dump_protocol()).unwrap();
    println!("wrote protocol.json");
    fs::write(out_dir.join("schedule_probe.json"), dump_schedule_probe()).unwrap();
    println!("wrote schedule_probe.json");
    println!("done: vectors in {}", out_dir.display());
}
