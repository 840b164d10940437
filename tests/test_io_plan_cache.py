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


def test_dead_appid_entries_pruned_when_new_appid_pins(spark):
    """r12: a fresh session's first load() drops plans cached under any
    other applicationId, bounding _PLAN_CACHE at tables x sf_dirs for
    the live session."""
    import weather_flink_spark.io as io

    load(spark, "/root/testdata/sf0.001", "orders")  # pin current appid
    appid = spark._wfs_appid
    io._PLAN_CACHE[("dead-app-123", "/root/testdata/sf0.001", "orders")] = object()
    # simulate a fresh session object pinning anew: clear the pin marker
    del spark._wfs_appid
    load(spark, "/root/testdata/sf0.001", "nation")
    assert ("dead-app-123", "/root/testdata/sf0.001", "orders") not in io._PLAN_CACHE
    # live-session entries survive the prune
    assert (appid, "/root/testdata/sf0.001", "orders") in io._PLAN_CACHE
