"""Wave-16 semantics beyond the oracle hash."""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_temporal_scd2_never_sees_the_future(spark):
    """Point-in-time contract: every enriched purchase carries a state
    whose interval STARTED at or before the purchase — no future
    leakage, and exactly one state per purchase."""
    rows = all_specs()["q_join_temporal_scd2"].fn(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.state_since <= r.ts
        assert r.event_id not in seen
        seen.add(r.event_id)
    n_purchases = (
        load(spark, SF, "events").filter("event_type = 'purchase'").count()
    )
    # every purchase falls inside some interval (its own event opens one)
    assert len(rows) == n_purchases


def test_snapshot_diff_classes_partition_users(spark):
    rows = all_specs()["q_cdc_snapshot_diff"].fn(spark, SF).collect()
    users = load(spark, SF, "events").select("user_id").distinct().count()
    assert len(rows) == users
    classes = {r.diff_class for r in rows}
    assert classes <= {"added", "changed", "unchanged"}
    for r in rows:
        if r.diff_class == "added":
            assert r.state_old is None and r.state_new is not None
        elif r.diff_class == "changed":
            assert r.state_old is not None and r.state_old != r.state_new
        else:
            assert r.state_old == r.state_new


def test_matryoshka_quality_monotone_in_prefix(spark):
    """Retained energy must grow with prefix length and hit exactly 1
    at the full dimension."""
    rows = {
        r.prefix_dim: r
        for r in all_specs()["q_emb_matryoshka_quality"].fn(spark, SF).collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    assert abs(rows[64].avg_energy_ratio - 1.0) < 1e-6
    assert abs(rows[64].avg_prefix_cosine - 1.0) < 1e-6
    for a, b in [(8, 16), (16, 32), (32, 64)]:
        assert rows[a].avg_energy_ratio < rows[b].avg_energy_ratio
        assert rows[a].avg_prefix_cosine < rows[b].avg_prefix_cosine
    for r in rows.values():
        assert 0.0 < r.avg_energy_ratio <= 1.0 + 1e-9


@pytest.mark.slow
def test_cluster_sizes_account_for_every_document(spark):
    rows = all_specs()["q_dedup_cluster_sizes"].fn(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.cluster_size * r.n_clusters for r in rows) == n_docs
    # singletons exist (most of any corpus is unique)
    ones = [r for r in rows if r.cluster_size == 1]
    assert ones and ones[0].n_clusters > 0


def test_shuffle_shards_are_balanced_and_deterministic(spark):
    rows = all_specs()["q_pack_shuffle_shards"].fn(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert len(rows) == n_docs
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.shard_pos)
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
        # md5 balance: no shard under/over by more than 3x expected
        assert n_docs / 24 <= len(poss) <= 3 * n_docs / 8
    # determinism: a rerun yields the identical assignment
    again = {
        (r.doc_id, r.shard_id, r.shard_pos)
        for r in all_specs()["q_pack_shuffle_shards"].fn(spark, SF).collect()
    }
    assert {(r.doc_id, r.shard_id, r.shard_pos) for r in rows} == again


def test_percentile_disc_returns_observed_values(spark):
    """Discrete percentiles must be actual column values (never an
    interpolation) and ordered p50 <= p90 <= p99."""
    rows = all_specs()["q_agg_percentile_disc"].fn(spark, SF).collect()
    e = load(spark, SF, "events")
    for r in rows:
        vals = {
            x[0]
            for x in e.filter(F.col("event_type") == r.event_type)
            .select("value")
            .collect()
        }
        assert r.p50_disc in vals and r.p90_disc in vals and r.p99_disc in vals
        assert r.p50_disc <= r.p90_disc <= r.p99_disc


@pytest.mark.slow
def test_bm25_topk_matches_full_scorer(spark):
    """The top-10 must be exactly the 10 best rows of the full scorer
    under (bm25 desc, doc_id asc), ranks 1..10."""
    top = sorted(
        all_specs()["q_text_bm25_topk"].fn(spark, SF).collect(),
        key=lambda r: r.rank,
    )
    full = all_specs()["q_text_bm25"].fn(spark, SF).collect()
    expect = sorted(full, key=lambda r: (-r.bm25, r.doc_id))[:10]
    assert [r.rank for r in top] == list(range(1, 11))
    assert [(r.doc_id, r.bm25) for r in top] == [
        (r.doc_id, r.bm25) for r in expect
    ]


def test_bm25_topk_plan_is_takeordered_no_global_window(spark):
    plan = (
        all_specs()["q_text_bm25_topk"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
