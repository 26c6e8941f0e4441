"""`models/parameter_selection.py` exercised end-to-end at CI scale
(reference `examples/parameter_selection.rs:31-99`; the full N=300 sweep is
run on TPU and recorded in docs/PARAM_SWEEP.md)."""

from mental_poker_tpu.models import parameter_selection as ps
from mental_poker_tpu.ops import curve as curve_mod


def test_benchmark_parameters_smoke():
    out = ps.benchmark_parameters(2, 4, curve_mod.stark_curve(), seed=3, verbose=False)
    assert out["cards"] == 8
    assert out["prove_s"] > 0 and out["verify_s"] > 0
    assert out["proof_bytes"] > 0


def test_sweep_helper_scaled_down():
    rows = ps.run_sweep(sweep=[(2, 4), (4, 2)], curve=curve_mod.stark_curve(), seed=5)
    assert [r["cards"] for r in rows] == [8, 8]
    # proof-size model: ~6m|G| + 4n|Z| — more rows (m) => bigger proof
    assert rows[1]["proof_bytes"] > rows[0]["proof_bytes"]
