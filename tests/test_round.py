"""End-to-end game round (mirrors reference `examples/round.rs:228-436`):
key ceremony, masked deck, sequential verified shuffles, deal, private peeks,
public reveal — with peek/open agreement asserted.

Scaled to an 8-card deck / 3 players for CI speed; the canonical 52-card
4-player shape runs in bench/models.
"""

from mental_poker_tpu.models.round import play_round


def test_full_round_small():
    opened = play_round(
        seed=99,
        m=2,
        n=4,
        player_names=(b"A", b"B", b"C"),
        num_shuffles=2,
    )
    assert len(opened) == 3
    # cards are dealt from a shuffled deck without replacement
    assert len(set(opened.values())) == 3


import pytest


@pytest.mark.slow
def test_full_round_canonical():
    """The flagship flow at the CANONICAL shape (`examples/round.rs:229-231,
    263-350`): 52 cards (m=2, n=26), 4 players, 4 sequential verified
    shuffles. Slow-marked (first run compiles the (2,26) stage zoo on the CPU
    backend); run via MPTPU_CI_SLOW=1 scripts/ci.sh or on TPU."""
    opened = play_round(
        seed=7,
        m=2,
        n=26,
        player_names=(b"Andrija", b"Kobi", b"Nico", b"Tom"),
        num_shuffles=4,
    )
    assert len(opened) == 4
    assert len(set(opened.values())) == 4
