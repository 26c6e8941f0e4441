"""Error types mirroring the reference's `CryptoError` / `CardProtocolError`.

The reference's negative tests assert exact proof-name strings
("Schnorr Identification", "Chaum-Pedersen", "Hadamard Product (5.1)") carried
by `CryptoError::ProofVerificationError` (`src/discrete_log_cards/tests.rs:74,
120,170,223`; `src/error.rs:6-18`). We preserve the same payloads.
"""

from __future__ import annotations


class CryptoError(Exception):
    """Base error for cryptographic primitives (proof-essentials' CryptoError)."""


class ProofVerificationError(CryptoError):
    """A proof failed to verify; `name` is the reference-exact proof name."""

    def __init__(self, name: str):
        self.name = name
        super().__init__(f"Proof verification failed: {name}")

    def __eq__(self, other):
        return isinstance(other, ProofVerificationError) and other.name == self.name

    def __hash__(self):
        return hash(("ProofVerificationError", self.name))


class CardProtocolError(Exception):
    """Protocol-level error wrapping CryptoError (reference `src/error.rs:6-18`)."""

    def __init__(self, inner: CryptoError | str):
        self.inner = inner
        super().__init__(str(inner))


# Reference-exact proof names.
SCHNORR = "Schnorr Identification"
CHAUM_PEDERSEN = "Chaum-Pedersen"
HADAMARD = "Hadamard Product (5.1)"
ZERO_ARG = "Zero Argument (5.2)"
SVP_ARG = "Single Value Product (5.3)"
MULTI_EXP = "Multi Exponentiation (4.1)"
SHUFFLE = "Shuffle"
