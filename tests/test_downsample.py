"""LTTB downsampling semantics on hand-computed fixtures, plus
PageRank invariants for the fixed-point iteration."""

from __future__ import annotations

import numpy as np

from weather_flink_spark.operators.downsample import _lttb_indices
from weather_flink_spark.plans.registry import all_specs


def _fn(name):
    return all_specs()[name].fn


def test_lttb_keeps_endpoints_and_spike():
    # flat line with one spike at i=5: any shape-preserving downsample
    # to 4 points must keep 0, the spike, and the last point
    x = np.arange(10, dtype=float)
    y = np.array([1.0, 1, 1, 1, 1, 9, 1, 1, 1, 1])
    idx = _lttb_indices(x, y, 4)
    assert idx[0] == 0 and idx[-1] == 9
    assert len(idx) == 4
    assert 5 in idx


def test_lttb_passthrough_when_series_small():
    x = np.arange(5, dtype=float)
    y = x * 2
    assert _lttb_indices(x, y, 12) == [0, 1, 2, 3, 4]


def test_lttb_plan_contract(spark, sf_dir):
    out = _fn("q_events_lttb")(spark, sf_dir)
    pdf = out.toPandas()
    per_user = pdf.groupby("user_id")
    assert (per_user.size() <= 12).all()
    # first/last of every kept series are rank 0 and max rank
    for uid, g in per_user:
        g = g.sort_values("sel_rank")
        assert list(g.sel_rank) == list(range(len(g)))
        assert g.ts.iloc[0] == g.ts.min()
        assert g.ts.iloc[-1] == g.ts.max()
    # deterministic: rerun hashes identically
    pdf2 = out.toPandas()
    a = pdf.sort_values(["user_id", "sel_rank"]).reset_index(drop=True)
    b = pdf2.sort_values(["user_id", "sel_rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_pagerank_mass_and_floor(spark, sf_dir):
    from weather_flink_spark.plans.analytics_extra import PR_SCALE

    rows = _fn("q_graph_pagerank")(spark, sf_dir).collect()
    n = len(rows)
    total = sum(r.rank_fp for r in rows)
    # dangling suppliers leak mass; floor divisions only lose mass
    assert total <= PR_SCALE
    assert total > PR_SCALE * 0.10  # teleport mass alone is 0.15
    teleport = PR_SCALE * 15 // 100 // n
    assert all(r.rank_fp >= teleport for r in rows)
    # customers have no in-edges: their rank is exactly the teleport floor
    cust = [r for r in rows if not r.is_supplier]
    assert cust and all(r.rank_fp == teleport for r in cust)


def test_holt_matches_hand_recursion(spark):
    import datetime as dt

    import pytest

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 12.0, 13.0, 15.0, 14.0]
    rows = [(1, i, base + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    from weather_flink_spark.operators.downsample import holt_forecast

    out = holt_forecast(df).collect()
    assert len(out) == 1
    a, b_ = 0.5, 0.3
    s, b = vals[0], vals[1] - vals[0]
    for x in vals[1:]:
        sp = s
        s = a * x + (1 - a) * (s + b)
        b = b_ * (s - sp) + (1 - b_) * b
    r = out[0]
    assert r.n_obs == 5
    assert r.level == pytest.approx(s, rel=1e-12)
    assert r.trend == pytest.approx(b, rel=1e-12)
    assert r.forecast_next == pytest.approx(s + b, rel=1e-12)


def test_holt_drops_singleton_series(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(9, 1, dt.datetime(2024, 1, 1), 5.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    from weather_flink_spark.operators.downsample import holt_forecast

    assert holt_forecast(df).count() == 0
