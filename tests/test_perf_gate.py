"""The perf-budget gate (benchmarks/perf_gate.py) — dfx-style JSON
budgets that CI fails on when bench regresses (reference
tests/dfx/perf/*.json)."""

import json
import pathlib
import sys

sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent / "benchmarks")
)
from perf_gate import check  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _budgets():
    return json.loads(open(ROOT / "benchmarks" / "budgets.json").read())


def test_gate_passes_on_recorded_good_run():
    metrics = {
        "value": 4028, "prefill_toks_per_s": 63290,
        "prefill_device_toks_per_s": 143372,
        "int8_toks_per_s": 5813, "int4_toks_per_s": 6647,
        "tts_rtf": 0.256, "tts_ttfp_ms": 170, "tts_rtf_c4": 0.345,
    }
    assert check(metrics, _budgets()) == []


def test_gate_flags_regressions_and_missing_metrics():
    b = _budgets()
    bad = {
        "value": 3000,  # below min
        "prefill_toks_per_s": 52000,
        "int8_toks_per_s": 5500,
        "int4_toks_per_s": 5800,
        "tts_rtf": 0.9,  # above max
        "tts_rtf_c4": 0.386,
        # tts_ttfp_ms missing entirely
    }
    breaches = check(bad, b)
    assert any("value" in x for x in breaches)
    assert any("tts_rtf" in x for x in breaches)
    assert any("tts_ttfp_ms" in x and "missing" in x for x in breaches)


def test_budgets_shape():
    b = _budgets()
    assert set(b) >= {"min", "max"}
    assert b["min"]["value"] > 0
    assert 0 < b["max"]["tts_rtf"] <= 1.0
