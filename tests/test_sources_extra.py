"""Invariant tests for the format round-trips, SCD2, and audit wave."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SPECS = all_specs()


def test_csv_roundtrip_counts_match_source(spark, sf_dir):
    rows = SPECS["q_source_csv_roundtrip"].fn(spark, sf_dir).collect()
    assert sum(r["n_cust"] for r in rows) == load(spark, sf_dir, "customer").count()


def test_jsonl_roundtrip_timestamp_survives(spark, sf_dir):
    rows = SPECS["q_source_jsonl_roundtrip"].fn(spark, sf_dir).collect()
    src_max = (
        load(spark, sf_dir, "orders").agg(F.max("o_orderdate").alias("m")).first()["m"]
    )
    assert max(r["last_order"] for r in rows) == src_max


def test_orc_roundtrip_matches_parquet_filter(spark, sf_dir):
    rows = SPECS["q_source_orc_roundtrip"].fn(spark, sf_dir).collect()
    expect = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .count()
    )
    assert sum(r["n_rows"] for r in rows) == expect


def test_scd2_intervals_partition_the_changelog(spark, sf_dir):
    rows = SPECS["q_scd2_intervals"].fn(spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    # every event is inside exactly one interval: per-user n_events sums
    # to the user's event count
    assert sum(r["n_events"] for r in rows) == e.count()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, ivals in by_user.items():
        ivals.sort(key=lambda r: r["valid_from"])
        # exactly one open interval (the current state), and it is last
        opens = [r for r in ivals if r["valid_to"] is None]
        assert len(opens) == 1 and ivals[-1]["valid_to"] is None
        for prev, nxt in zip(ivals, ivals[1:]):
            assert prev["valid_to"] == nxt["valid_from"], "intervals must chain"
            assert prev["state"] != nxt["state"], "adjacent states must differ"


def test_approx_quantile_within_bounds(spark, sf_dir):
    row = SPECS["q_agg_approx_quantile"].fn(spark, sf_dir).first()
    assert row["within_bounds"] is True
    assert row["p50_exact"] <= row["p90_exact"]


def test_minhash_estimator_error_is_bounded(spark, sf_dir):
    rows = SPECS["q_dedup_minhash_accuracy"].fn(spark, sf_dir).collect()
    assert rows, "LSH blocking should surface candidate pairs"
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1e-12
    # 8 perms → std ≈ sqrt(j(1-j)/8) ≤ 0.18; mean error across blocked
    # pairs (high-similarity skewed) should stay well under one perm step
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err <= 0.25, mean_err


def test_anomaly_zscore_flags_tails_only(spark, sf_dir):
    rows = SPECS["q_events_anomaly_zscore"].fn(spark, sf_dir).collect()
    assert rows, "2-sigma tails should be non-empty at fixture scale"
    assert all(abs(r["z"]) > 2 for r in rows)
    # outliers must be rare: well under 10% of events at |z|>2
    total = load(spark, sf_dir, "events").count()
    assert len(rows) < 0.1 * total


def test_cdc_merge_actions_partition_users(spark, sf_dir):
    rows = SPECS["q_cdc_merge_upsert"].fn(spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    assert len(rows) == e.select("user_id").distinct().count()
    actions = {r["action"] for r in rows}
    assert actions <= {"keep", "insert", "update"}
    # merged snapshot must equal the all-time latest state per user
    latest = {
        r["user_id"]: r["last_ts"]
        for r in SPECS["q_latest_snapshot"].fn(spark, sf_dir).collect()
    }
    for r in rows:
        assert r["final_ts"] == latest[r["user_id"]]


def test_file_sink_roundtrip_counts(spark, sf_dir):
    rows = SPECS["s_file_sink_roundtrip"].fn(spark, sf_dir).collect()
    assert rows and all(r["n_events"] > 0 for r in rows)


def test_kafka_payload_is_valid_json_with_key(spark, sf_dir):
    import json

    rows = SPECS["q_sink_kafka_payload"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows[:20]:
        payload = json.loads(r["value"])
        assert str(payload["event_id"]).isdigit() or isinstance(payload["event_id"], int)
        assert payload["timestamp"] == r["record_ts"], "A4: payload carries the record ts"
        assert r["key"] is not None


def test_collect_bounded_arrays_sorted_capped(spark, sf_dir):
    rows = SPECS["q_agg_collect_bounded"].fn(spark, sf_dir).collect()
    for r in rows:
        vals = r["smallest_values"]
        assert 1 <= len(vals) <= 5
        assert vals == sorted(vals)
        assert r["n_events"] >= len(vals)


def test_badrecords_exact_split(spark, sf_dir):
    row = SPECS["q_source_badrecords_tolerant"].fn(spark, sf_dir).first()
    assert row["n_good"] == load(spark, sf_dir, "orders").count()
    assert row["n_bad"] == 3


def test_bigram_lm_probabilities_normalize(spark, sf_dir):
    rows = SPECS["q_text_bigram_lm"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["cond_prob"] <= 1.0
        assert r["c_bigram"] <= r["c_prefix"]


def test_union_schema_evolution_nulls_only_for_old_writer(spark, sf_dir):
    rows = {r["writer"]: r for r in SPECS["q_union_schema_evolution"].fn(spark, sf_dir).collect()}
    assert rows["v1"]["n_with_priority"] == 0, "old writer lacks the field → all null"
    assert rows["v2"]["n_with_priority"] == rows["v2"]["n_rows"], "new writer always has it"
