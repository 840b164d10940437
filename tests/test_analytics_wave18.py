"""Wave-18 semantics beyond the oracle hash."""

from __future__ import annotations
import pytest

import math

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_croston_forecast_consistency(spark):
    rows = all_specs()["q_orders_croston"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_demand_periods >= 2
        assert r.demand_size > 0
        assert r.demand_interval >= 1.0  # weekly grid: gaps are >= 1
        assert abs(r.forecast_per_week - r.demand_size / r.demand_interval) < 1e-12


def test_bayes_ab_probability_is_calibrated(spark):
    r = all_specs()["q_stats_bayes_ab"].fn(spark, SF).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert 0.0 <= r.prob_b_beats_a <= 1.0
    # direction: if B's rate is higher, P(B>A) > 0.5 (and vice versa)
    if r.rate_b > r.rate_a:
        assert r.prob_b_beats_a > 0.5
    elif r.rate_b < r.rate_a:
        assert r.prob_b_beats_a < 0.5


def test_pcm_features_match_local_arithmetic(spark):
    rows = {
        r.doc_id: r
        for r in all_specs()["q_multimodal_pcm_features"].fn(spark, SF).collect()
    }
    docs = load(spark, SF, "documents").select("doc_id", "text").limit(25).collect()
    for d in docs:
        b = d.text.encode("utf-8")
        pcm = [v if v < 128 else v - 256 for v in b]
        r = rows[d.doc_id]
        assert r.n_samples == len(pcm)
        assert r.peak == max(abs(v) for v in pcm)
        assert r.energy == sum(v * v for v in pcm)
        assert abs(r.rms - round(math.sqrt(r.energy / r.n_samples), 6)) < 1e-12
        assert r.zero_crossings == sum(
            1 for i in range(len(pcm) - 1) if pcm[i] * pcm[i + 1] < 0
        )


def test_hashing_trick_bounded_width(spark):
    rows = all_specs()["q_text_hashing_trick"].fn(spark, SF).collect()
    assert rows
    per_doc: dict[int, int] = {}
    for r in rows:
        assert 0 <= r.bucket < 64
        assert r.weight != 0
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert all(n <= 64 for n in per_doc.values())
    assert len(per_doc) <= 100


def test_quality_expectations_all_pass_on_clean_data(spark):
    rows = {r.rule: r for r in all_specs()["q_quality_expectations"].fn(spark, SF).collect()}
    assert set(rows) == {
        "orders_nonempty",
        "orderkey_unique",
        "lineitem_fk_orders",
        "quantity_in_range",
        "shipdate_not_null",
        "custkey_resolves",
    }
    # the driver's TPC-H-ish generator produces referentially-clean data
    assert all(r.passed for r in rows.values()), rows


def test_partition_balance_flags_low_cardinality_key(spark):
    rows = {r.key_name: r for r in all_specs()["q_diag_partition_balance"].fn(spark, SF).collect()}
    u, t = rows["user_id"], rows["event_type"]
    assert u.total_rows == t.total_rows
    # 5-value event_type can use at most 5 of 32 partitions; user_id spreads
    assert t.parts_used <= 5 < u.parts_used
    assert t.skew_ratio > u.skew_ratio
    assert u.skew_ratio >= 1.0


def test_range_search_subsumes_topk_above_radius(spark):
    """Every top-k hit with cosine >= radius must appear in the range
    result; range results all clear the radius."""
    rng = {
        (r.query_id, r.vec_id): r.cosine
        for r in all_specs()["q_sim_range_search"].fn(spark, SF).collect()
    }
    assert rng
    for (_, _), c in rng.items():
        assert c >= 0.25
    topk = all_specs()["q_sim_cosine_topk"].fn(spark, SF).collect()
    for r in topk:
        if round(r.cosine, 6) >= 0.25 and r.query_id < 5:
            assert (r.query_id, r.vec_id) in rng
