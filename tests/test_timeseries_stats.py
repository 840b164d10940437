"""Unit tests for the time-series statistics operators on crafted data
(semantics that the sf0.001 oracle diff can't pin down by itself:
interpolation rules, reset epochs, LOCF weighting, DST boundaries)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weather_flink_spark.plans import timeseries_stats  # noqa: F401  (registration)
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _by_name(name):
    return all_specs()[name].fn


def test_moving_median_interpolates_even_frames(spark, sf_dir):
    out = _by_name("q_win_moving_median")(spark, sf_dir)
    rows = (
        out.filter(F.col("user_id") == out.select("user_id").first()[0])
        .orderBy("ts", "event_id")
        .select("value", "med5")
        .collect()
    )
    vals = [r.value for r in rows]
    for i, r in enumerate(rows):
        window = sorted(vals[max(0, i - 4) : i + 1])
        n = len(window)
        expect = window[n // 2] if n % 2 == 1 else (window[n // 2 - 1] + window[n // 2]) / 2
        assert r.med5 == pytest.approx(expect, abs=0, rel=0), f"row {i}"


def test_counter_resets_epoch_semantics(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, base + dt.timedelta(minutes=i), v)
        for i, v in enumerate([10.0, 15.0, 3.0, 4.0, 2.0])
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    df.createOrReplaceTempView("_ctr")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    increase = (
        F.when(delta.isNull(), F.lit(0.0)).when(delta < 0, F.col("value")).otherwise(delta)
    )
    got = [
        r.inc
        for r in df.select(increase.alias("inc")).orderBy("ts").collect()
    ]
    # resets at 15->3 (epoch restarts at 3) and 4->2 (restarts at 2)
    assert got == [0.0, 5.0, 3.0, 1.0, 2.0]


def test_twa_weights_by_hold_duration(spark):
    base = dt.datetime(2024, 1, 1)
    # value 10 held for 1s, value 20 held for 3s -> twa = (10*1 + 20*3)/4
    rows = [
        (7, 1, base, 10.0),
        (7, 2, base + dt.timedelta(seconds=1), 20.0),
        (7, 3, base + dt.timedelta(seconds=4), 99.0),  # last obs: no span
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        # reuse the registered plan end-to-end via a tiny parquet "events"
        # io.load reads events.ts as a nanos long (TIMESTAMP(NANOS) layout)
        df.select(
            "event_id",
            (F.unix_micros("ts") * 1000).alias("ts"),
            "user_id",
            F.lit("x").alias("event_type"),
            "value",
            F.lit("{}").alias("props"),
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = _by_name("q_events_time_weighted_avg")(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_spans == 2
    assert r.total_ms == 4000
    assert r.twa == pytest.approx((10.0 * 1 + 20.0 * 3) / 4, rel=1e-12)


def test_ohlc_open_close_ordering(spark, sf_dir):
    out = _by_name("q_events_ohlc")(spark, sf_dir)
    r = out.orderBy("event_type", "bucket_hour").first()
    assert r.low <= r.open <= r.high
    assert r.low <= r.close <= r.high
    assert r.n_obs >= 1


def test_timezones_dst_awareness(spark):
    # 2024-01-15 (EST, UTC-5) vs 2024-07-15 (EDT, UTC-4)
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 15, 12, 0),), (dt.datetime(2024, 7, 15, 12, 0),)],
        "ts timestamp",
    )
    got = df.select(
        F.hour(F.from_utc_timestamp("ts", "America/New_York")).alias("h")
    ).collect()
    assert [r.h for r in got] == [7, 8]


def test_ewma_matches_pandas_recursion(spark):
    import os
    import tempfile

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 20.0, 15.0, 30.0, 5.0, 25.0]
    rows = [(1, i, base + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    with tempfile.TemporaryDirectory() as d:
        df.select(
            "event_id",
            (F.unix_micros("ts") * 1000).alias("ts"),
            "user_id",
            F.lit("x").alias("event_type"),
            "value",
            F.lit("{}").alias("props"),
        ).write.parquet(os.path.join(d, "events.parquet"))
        got = [
            r.ewma10
            for r in _by_name("q_win_ewma")(spark, d).orderBy("event_id").collect()
        ]
    # frame is 10 rows; the 6-point series fits, so this equals the full
    # recursive EWMA: pandas ewm(alpha=0.3, adjust=False)
    want = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().tolist()
    assert got == pytest.approx(want, rel=1e-12)
