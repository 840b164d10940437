"""Invariant tests for the pipeline-management wave (plans/pipeline_extra.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SPECS = all_specs()


def test_cross_join_cardinality(spark, sf_dir):
    rows = SPECS["q_join_cross"].fn(spark, sf_dir).collect()
    n = load(spark, sf_dir, "nation").count()
    r = load(spark, sf_dir, "region").count()
    assert len(rows) == n * r
    # every nation belongs to exactly one region
    assert sum(1 for row in rows if row["same_region"]) == n


def test_sql_q3_revenue_positive_and_grouped(spark, sf_dir):
    df = SPECS["q_sql_tpch_q3"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows, "Q3 predicate window must select some orders"
    assert all(row["revenue"] > 0 for row in rows)
    keys = [row["l_orderkey"] for row in rows]
    assert len(keys) == len(set(keys)), "one row per order"


def test_stratified_sample_rates(spark, sf_dir):
    rows = SPECS["q_sample_stratified"].fn(spark, sf_dir).collect()
    for row in rows:
        assert 0 <= row["n_sampled"] <= row["n_docs"]
        # hash bucketing at these corpus sizes should land within ±20pp
        # of target — loose bound, just catches inverted/broken predicates
        achieved = 100.0 * row["n_sampled"] / row["n_docs"]
        assert abs(achieved - row["target_pct"]) < 20.0, (row["lang"], achieved)
    assert {row["target_pct"] for row in rows} == {50, 20, 10}


def test_repetition_fractions_bounded(spark, sf_dir):
    rows = SPECS["q_text_repetition"].fn(spark, sf_dir).collect()
    assert rows
    for row in rows:
        assert row["n_words"] > 0
        assert 0.0 < row["top_word_frac"] <= 1.0
        if row["n_trigrams"] > 0:
            assert 0.0 <= row["dup_trigram_frac"] <= 1.0
        else:
            assert row["dup_trigram_frac"] is None


def test_retention_day_zero_covers_cohort(spark, sf_dir):
    df = SPECS["q_events_retention"].fn(spark, sf_dir)
    rows = df.collect()
    assert all(row["day_offset"] >= 0 for row in rows)
    # day-0 retention across cohorts must count every user exactly once
    day0 = sum(row["n_users"] for row in rows if row["day_offset"] == 0)
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert day0 == n_users


def test_time_range_window_brackets_counts(spark, sf_dir):
    rows = SPECS["q_win_time_range"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_last_hour"] >= 1, "frame always includes the current row"


def test_boolean_aggregates_consistent(spark, sf_dir):
    rows = SPECS["q_agg_boolean"].fn(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["n_large"] <= r["n_events"]
        if r["any_huge"]:
            assert r["n_large"] > 0, "a >500 value is also >100"


def test_string_agg_sorted_and_complete(spark, sf_dir):
    rows = SPECS["q_agg_string"].fn(spark, sf_dir).collect()
    n_total = load(spark, sf_dir, "nation").count()
    assert sum(r["n_nations"] for r in rows) == n_total
    for r in rows:
        parts = r["nations"].split(",")
        assert parts == sorted(parts)
        assert len(parts) == r["n_nations"]


def test_regex_extract_all_masks_consistently(spark, sf_dir):
    rows = SPECS["q_string_regex_extract_all"].fn(spark, sf_dir).collect()
    for r in rows[:50]:
        total_digits = sum(len(run) for run in r["digit_runs"])
        assert not any(ch.isdigit() for ch in r["masked"]), "every digit masked"
        # '#' count = replaced digits + literal '#'s already in the name
        assert r["masked"].count("#") >= total_digits


def test_recursive_spine_covers_every_day(spark, sf_dir):
    rows = SPECS["q_sql_recursive_cte"].fn(spark, sf_dir).collect()
    assert len(rows) == 30, "one row per spine day, including zero-event days"
    assert sum(r["n_events"] for r in rows) == load(spark, sf_dir, "events").count()


def test_latest_snapshot_one_row_per_user_at_max_ts(spark, sf_dir):
    snap = SPECS["q_latest_snapshot"].fn(spark, sf_dir)
    e = load(spark, sf_dir, "events")
    assert snap.count() == e.select("user_id").distinct().count()
    maxes = e.groupBy("user_id").agg(F.max("ts").alias("max_ts"))
    mismatched = (
        snap.join(maxes, "user_id")
        .filter(F.col("last_ts") != F.col("max_ts"))
        .count()
    )
    assert mismatched == 0
