"""Unit semantics of q_events_funnel_attribution on a constructed
fixture — the properties the gaps-and-islands oracle can't isolate:
session splitting at exactly the 30-minute gap, last-touch credit
choosing the latest qualified click, and clicks without a prior
in-session view never qualifying."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )


def _run(spark, df, monkeypatch):
    import weather_flink_spark.plans.analytics_wave25 as w25

    monkeypatch.setattr(
        "weather_flink_spark.plans.analytics_wave25.load",
        lambda _spark, _sf, _table: df,
    )
    return {
        (r["user_id"], r["session_id"]): r
        for r in w25.q_events_funnel_attribution(spark, "unused").collect()
    }


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_session_split_and_last_touch_credit(spark, monkeypatch):
    rows = [
        # session 1: view -> click(2) -> click(3) -> purchase: credit click 3
        (1, 1, _t(0), "view"),
        (1, 2, _t(1), "click"),
        (1, 3, _t(2), "click"),
        (1, 4, _t(3), "purchase"),
        # 31-minute gap after the purchase -> session 2: lone purchase,
        # no in-session view/click: no credit
        (1, 5, _t(34), "purchase"),
    ]
    out = _run(spark, _df(spark, rows), monkeypatch)
    s1 = out[(1, 1)]
    assert s1["has_view"] and s1["n_qualified_clicks"] == 2
    assert s1["n_conversions"] == 1
    assert s1["credit_click_id"] == 3  # last qualified click wins
    assert s1["credit_lag_s"] == 60.0
    s2 = out[(1, 2)]
    assert s2["n_conversions"] == 0 and s2["credit_click_id"] is None


def test_click_without_view_never_qualifies(spark, monkeypatch):
    rows = [
        (2, 1, _t(0), "click"),
        (2, 2, _t(1), "purchase"),
        # view AFTER the click: the click is still unqualified
        (2, 3, _t(2), "view"),
        (2, 4, _t(3), "purchase"),
    ]
    out = _run(spark, _df(spark, rows), monkeypatch)
    s = out[(2, 1)]
    assert s["n_qualified_clicks"] == 0
    assert s["n_conversions"] == 0
    assert s["credit_click_id"] is None


def test_exact_30min_gap_keeps_session(spark, monkeypatch):
    rows = [
        (3, 1, _t(0), "view"),
        (3, 2, dt.datetime(2024, 1, 1, 10, 30, 0), "click"),  # gap == 30 min
        (3, 3, dt.datetime(2024, 1, 1, 11, 0, 30), "purchase"),  # gap > 30 min
    ]
    out = _run(spark, _df(spark, rows), monkeypatch)
    assert set(out) == {(3, 1), (3, 2)}
    assert out[(3, 1)]["session_events"] == 2  # view + click together
    assert out[(3, 2)]["n_conversions"] == 0  # purchase alone, no credit


def test_same_timestamp_view_qualifies_click(spark, monkeypatch):
    t0 = _t(0)
    rows = [
        (4, 2, t0, "click"),  # same instant; view (kindr 0) sorts first
        (4, 1, t0, "view"),
        (4, 3, _t(1), "purchase"),
    ]
    out = _run(spark, _df(spark, rows), monkeypatch)
    s = out[(4, 1)]
    assert s["n_qualified_clicks"] == 1
    assert s["credit_click_id"] == 2
