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
    # shaped like the round-5 bench line
    metrics = {
        "value": 4220, "prefill_toks_per_s": 66196,
        "prefill_bs32_toks_per_s": 94343,
        "prefill_device_toks_per_s": 137581,
        "int8_toks_per_s": 5822, "int4_toks_per_s": 6902,
        "int4_bs32_toks_per_s": 16106,
        "tts_rtf": 0.276, "tts_ttfp_ms": 201, "tts_rtf_c4": 0.317,
        "tts_rtf_c8": 0.359, "dit_block_mfu": 0.55,
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
