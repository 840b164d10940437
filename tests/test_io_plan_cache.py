"""io.load's resolved-plan cache (r11): schema resolution happens once
per (session, sf_dir, table); the cache returns logical plans, never
rows — executions still scan the parquet input."""

from __future__ import annotations

from weather_flink_spark.io import TABLES, load


def test_load_returns_same_plan_object(spark):
    a = load(spark, "/root/testdata/sf0.001", "orders")
    b = load(spark, "/root/testdata/sf0.001", "orders")
    assert a is b  # one schema resolution per session+sf+table


def test_load_keys_on_sf_dir(spark):
    a = load(spark, "/root/testdata/sf0.001", "orders")
    c = load(spark, "/root/testdata/sf0.01", "orders")
    assert a is not c
    assert a.count() != c.count()  # genuinely different datasets


def test_cached_events_normalization_sticks(spark):
    from pyspark.sql import types as T

    e1 = load(spark, "/root/testdata/sf0.001", "events")
    e2 = load(spark, "/root/testdata/sf0.001", "events")
    assert e1 is e2
    assert isinstance(e1.schema["ts"].dataType, T.TimestampType)


def test_all_tables_load(spark):
    for t in TABLES:
        assert load(spark, "/root/testdata/sf0.001", t).columns
