"""bench_budget: ambient-window labeling (r7 verdict task #3) and the
missing-entry gap detection (r7 ADVICE) — pure-python, no Spark."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "bench_budget_under_test", REPO / "tools" / "bench_budget.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_budget_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj) + "\n")
    return p


def _baseline(tmp_path, mod, table):
    p = _write(
        tmp_path,
        "baseline.json",
        {k: {"seconds": v, "round": "rX", "protocol": "t"} for k, v in table.items()},
    )
    mod.BASELINE_PATH = p


def test_clean_window_over_budget_fails_with_rc1(tmp_path, capsys):
    mod = _load_module()
    _baseline(tmp_path, mod, {"q_a": 0.5, "q_b": 0.5})
    bench = _write(
        tmp_path,
        "bench.json",
        {"queries": {"q_a": 2.0, "q_b": 0.5}, "ambient_factor": 1.0},
    )
    assert mod.check(bench) == 1
    out = capsys.readouterr().out
    assert "OVER-BUDGET q_a" in out
    assert "DEGRADED" not in out


def test_degraded_window_labels_and_rc2(tmp_path, capsys):
    mod = _load_module()
    _baseline(tmp_path, mod, {"q_a": 0.5, "q_b": 0.5})
    bench = _write(
        tmp_path,
        "bench.json",
        {"queries": {"q_a": 2.0, "q_b": 0.5}, "ambient_factor": 2.1},
    )
    assert mod.check(bench) == 2
    out = capsys.readouterr().out
    assert "OVER-BUDGET-IN-DEGRADED-WINDOW q_a" in out
    assert "re-time before believing" in out


def test_all_within_budget_passes(tmp_path, capsys):
    mod = _load_module()
    _baseline(tmp_path, mod, {"q_a": 0.5})
    bench = _write(
        tmp_path,
        "bench.json",
        {"queries": {"q_a": 0.6}, "ambient_factor": 1.2},
    )
    assert mod.check(bench) == 0
    assert "ambient_factor 1.2 (ok" in capsys.readouterr().out


def test_missing_live_entry_fails_even_in_degraded_window(tmp_path, capsys):
    """A baselined entry that silently vanished from the bench is a
    gap, not noise — ambient degradation must not mask it."""
    mod = _load_module()
    # q_agg_groupby is certainly still registered
    _baseline(tmp_path, mod, {"q_agg_groupby": 0.5})
    bench = _write(
        tmp_path,
        "bench.json",
        {"queries": {"q_other": 0.1}, "ambient_factor": 2.5},
    )
    assert mod.check(bench) == 1
    assert "MISSING q_agg_groupby" in capsys.readouterr().out


def test_ambient_scaled_band_masks_contention(tmp_path, capsys):
    """r10 verdict task #3 (masked-ambient case): an entry at 2.5x raw
    under ambient 1.4 sits inside the 2.8x ambient-scaled band — not
    flagged, but the raw number is still printed (AMBIENT-MASKED)."""
    mod = _load_module()
    _baseline(tmp_path, mod, {"q_a": 1.0})
    bench = _write(
        tmp_path,
        "bench.json",
        {"queries": {"q_a": 2.5}, "ambient_factor": 1.4},
    )
    assert mod.check(bench) == 0
    out = capsys.readouterr().out
    assert "AMBIENT-MASKED q_a" in out
    assert "2.50x raw" in out
    assert "OVER-BUDGET" not in out


def test_ambient_scaled_band_still_catches_genuine_regression(tmp_path, capsys):
    """r10 verdict task #3 (caught-genuine-regression case): a real
    regression scales WITH ambient — 3.5x raw under ambient 1.4 is past
    the 2.8x scaled band and still fails. And the scale is CAPPED: at
    ambient 3.0 the band is still 2 x 1.5 = 3.0x, so a 3.5x entry flags
    (as a degraded-window rc2, per the existing protocol)."""
    mod = _load_module()
    _baseline(tmp_path, mod, {"q_a": 1.0})
    bench = _write(
        tmp_path,
        "bench.json",
        {"queries": {"q_a": 3.5}, "ambient_factor": 1.4},
    )
    assert mod.check(bench) == 1
    assert "OVER-BUDGET q_a" in capsys.readouterr().out
    bench_hot = _write(
        tmp_path,
        "bench_hot.json",
        {"queries": {"q_a": 3.5}, "ambient_factor": 3.0},
    )
    assert mod.check(bench_hot) == 2
    assert "OVER-BUDGET-IN-DEGRADED-WINDOW q_a" in capsys.readouterr().out


def test_stale_baseline_entry_warns_only(tmp_path, capsys):
    mod = _load_module()
    _baseline(tmp_path, mod, {"q_gone_forever_xyz": 0.5})
    bench = _write(tmp_path, "bench.json", {"queries": {"q_other": 0.1}})
    assert mod.check(bench) == 0
    assert "WARN stale-baseline q_gone_forever_xyz" in capsys.readouterr().out
