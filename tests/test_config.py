"""Config entry point (SURVEY §5 config row: dataclass over scattered env)."""

import dataclasses

from mental_poker_tpu.config import (
    ProtocolConfig,
    RuntimeConfig,
    get_config,
    override,
    set_config,
)


def test_env_backing(monkeypatch):
    monkeypatch.setenv("MPTPU_FIXED_WINDOW", "8")
    monkeypatch.setenv("MPTPU_STAGE_TIMING", "1")
    monkeypatch.setenv("MPTPU_PALLAS", "0")
    set_config(None)  # force re-read
    try:
        cfg = get_config()
        assert cfg.fixed_window_bits == 8
        assert cfg.stage_timing is True
        assert cfg.pallas is False
    finally:
        set_config(None)


def test_override_context():
    base = get_config()
    with override(bench_batch=7) as cfg:
        assert cfg.bench_batch == 7
        assert get_config().bench_batch == 7
    assert get_config().bench_batch == base.bench_batch


def test_frozen():
    import pytest

    with pytest.raises(dataclasses.FrozenInstanceError):
        get_config().bench_reps = 9  # type: ignore[misc]


def test_protocol_config_curves():
    assert ProtocolConfig(m=4, n=13).deck_size == 52
    assert ProtocolConfig().make_curve().host.name == "stark"
    assert ProtocolConfig(curve="bls12_377_g1").make_curve().host.name == "bls12_377_g1"


def test_knob_consumers_route_through_config():
    from mental_poker_tpu.ops.msm import default_fixed_window
    from mental_poker_tpu.ops.pallas.field import use_pallas

    with override(fixed_window_bits=6):
        assert default_fixed_window() == 6
    with override(pallas=False):
        assert use_pallas() is False
    with override(pallas=True):
        assert use_pallas() is True
