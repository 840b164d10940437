"""Wave-60: exact Shapley multi-touch attribution."""

from __future__ import annotations

import itertools
import math

import pandas as pd

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"
CONV = "purchase"


def _python_shapley(sf: str) -> dict[str, float]:
    """Independent pure-Python replay: journeys by the purchase-restart
    rule, v(S) by touch-set containment, phi by direct permutation-free
    subset enumeration over frozensets (no bitmasks — a genuinely
    different representation from both engines)."""
    e = (
        pd.read_parquet(f"{sf}/events.parquet")
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    channels = sorted(set(e.event_type) - {CONV})
    journeys: list[tuple[frozenset, int]] = []
    for _, g in e.groupby("user_id"):
        touched: set[str] = set()
        for t in g.event_type:
            if t == CONV:
                journeys.append((frozenset(touched), 1))
                touched = set()
            else:
                touched.add(t)
        if touched:
            journeys.append((frozenset(touched), 0))
        # an empty trailing journey (user ends on a purchase) adds no row
        # in the engine either: no events after the last restart
    k = len(channels)

    def v(s: frozenset) -> int:
        return sum(c for ts, c in journeys if ts <= s)

    phi = {}
    for c in channels:
        rest = [x for x in channels if x != c]
        tot = 0.0
        for r in range(len(rest) + 1):
            for sub in itertools.combinations(rest, r):
                s = frozenset(sub)
                w = (
                    math.factorial(len(s))
                    * math.factorial(k - 1 - len(s))
                    / math.factorial(k)
                )
                tot += w * (v(s | {c}) - v(s))
        phi[c] = tot
    return phi


def test_shapley_matches_independent_python_replay(spark):
    rows = {
        r.channel: r
        for r in all_specs()["q_events_attribution_shapley"].fn(spark, SF).collect()
    }
    expect = _python_shapley(SF)
    assert set(rows) == set(expect)
    for c, want in expect.items():
        assert abs(rows[c].shapley_value - want) < 1e-9, (c, rows[c], want)


def test_shapley_efficiency_axiom(spark):
    """sum(phi) == v(N) - v(empty): total distributed credit equals
    the conversions any channel could influence (empty-touch-set
    conversions are exactly the unattributable remainder)."""
    rows = all_specs()["q_events_attribution_shapley"].fn(spark, SF).collect()
    e = (
        pd.read_parquet(f"{SF}/events.parquet")
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    v_full = v_empty = 0
    for _, g in e.groupby("user_id"):
        touched = 0
        for t in g.event_type:
            if t == CONV:
                v_full += 1
                if touched == 0:
                    v_empty += 1
                touched = 0
            else:
                touched += 1
    assert abs(sum(r.shapley_value for r in rows) - (v_full - v_empty)) < 1e-9
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    assert all(r.shapley_value >= 0 for r in rows)
