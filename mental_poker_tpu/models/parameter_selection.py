"""Parameter-selection benchmark (L5): the reference's
`examples/parameter_selection.rs` flow.

The Bayer-Groth cost model (`parameter_selection.rs:1-10`): the prover computes
m*N curve exponentiations for a deck of N = m*n cards, and the proof serializes
to ~ 6m*|G| + 4n*|Z| bytes (~12m + 4n point-size units for |G| ~ 2|Z|),
minimized at m ~ n/3. This module sweeps (m, n) splits, measuring prover
wall-time, verifier wall-time, and serialized proof size — the reference sweeps
(m,n) in {(2,150),(6,50),(10,30),(12,25),(30,10)} for N = 300 on BLS12-377 G1
(`parameter_selection.rs:41-42`).
"""

from __future__ import annotations

import time

from ..crypto import elgamal, proof_io
from ..protocol.dl_cards import DLCards
from ..utils.rand import GameRng

REFERENCE_SWEEP = [(2, 150), (6, 50), (10, 30), (12, 25), (30, 10)]


def benchmark_parameters(m: int, n: int, curve=None, seed: int = 0, verbose: bool = True) -> dict:
    """One (m, n) point: full key ceremony + shuffle prove/verify timing
    (`parameter_selection.rs:31-99`)."""
    proto = DLCards(curve)
    rng = GameRng(seed)
    num_cards = m * n
    pp = proto.setup(rng, m, n)

    pk, sk = proto.player_keygen(rng, pp)
    info = b"Player 0"
    key_proof = proto.prove_key_ownership(rng, pp, pk, sk, info)
    joint_pk = proto.compute_aggregate_key(pp, [(pk, key_proof, info)])

    deck = elgamal.rand_ciphertexts(proto.cv, rng, num_cards)
    pi = rng.permutation(num_cards)
    rho = [rng.scalar(proto.cv.host.order) for _ in range(num_cards)]

    t0 = time.perf_counter()
    shuffled, proof = proto.shuffle_and_remask(rng, pp, joint_pk, deck, rho, pi)
    prove_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    proto.verify_shuffle(pp, joint_pk, deck, shuffled, proof)
    verify_s = time.perf_counter() - t0

    size = proof_io.shuffle_proof_size(proof, proto.cv.host)
    out = {
        "m": m,
        "n": n,
        "cards": num_cards,
        "prove_s": prove_s,
        "verify_s": verify_s,
        "proof_bytes": size,
    }
    if verbose:
        print(
            f"m={m:3d} n={n:4d} N={num_cards:5d}: prove {prove_s:8.3f}s  "
            f"verify {verify_s:8.3f}s  proof {size:7d} B"
        )
    return out


def run_sweep(sweep=None, curve=None, seed: int = 0) -> list[dict]:
    """The full reference sweep (N = 300). Heavy; see also the scaled-down
    default used in tests."""
    from ..ops import curve as curve_mod

    cv = curve or curve_mod.bls12_377_g1()
    return [benchmark_parameters(m, n, cv, seed) for (m, n) in (sweep or REFERENCE_SWEEP)]


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 3:
        benchmark_parameters(int(sys.argv[1]), int(sys.argv[2]))
    else:
        run_sweep()
