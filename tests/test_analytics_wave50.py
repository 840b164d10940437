"""Wave-50: HNSW medoid/highway refresh — work-order sanity and the
search-recall-parity proof (refreshed >= stale, same searcher)."""

from __future__ import annotations
import pytest

import pyspark.sql.functions as F

from weather_flink_spark.plans import analytics_wave26 as w26
from weather_flink_spark.plans import analytics_wave50 as w50
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_refresh_work_order_matches_batch_builder(spark):
    """The refreshed column IS the batch builder's medoid election,
    and stale medoids are always pre-epoch nodes."""
    rows = {r.cell: r for r in all_specs()["q_sim_ann_hnsw_refresh"].fn(spark, SF).collect()}
    fresh = {r.cell: r.node for r in w26.l1_medoids_table(spark, SF).collect()}
    assert {c: r.refreshed_node for c, r in rows.items()} == fresh

    from weather_flink_spark.plans.analytics_wave4 import (
        kmeans_final_assignment,
    )

    _, final = kmeans_final_assignment(spark, SF)
    cut = final.agg(F.expr("max(vec_id) * 4 div 5")).collect()[0][0]
    n_changed = 0
    for r in rows.values():
        if r.stale_node is not None:
            assert r.stale_node < cut
        if r.medoid_changed:
            n_changed += 1
            # a changed medoid means the refreshed winner arrived in
            # the epoch (pre-epoch ordering can't change)
            assert r.refreshed_node >= cut
        assert r.n_new_coarse >= 0
    # the 20% epoch at the fixture genuinely perturbs the structure —
    # otherwise this test proves nothing (guard against a fixture
    # regeneration silently making the refresh a no-op)
    assert n_changed >= 1, "epoch produced no medoid drift"


@pytest.mark.slow
def test_refreshed_recall_geq_stale(spark):
    """Run the SAME 2-layer searcher against the stale coarse
    structures (stale medoids + topology rebuilt from them) and the
    refreshed ones; recall vs the shared exact ground truth must not
    decrease after the refresh."""
    from weather_flink_spark.plans.llm_extra import exact_topk_table

    exact = exact_topk_table(spark, SF).select("query_id", "vec_id")

    def recall(result) -> float:
        hits = exact.join(
            result.select(
                F.col("query_id").alias("h_query"),
                F.col("vec_id").alias("h_vec"),
            ),
            (F.col("query_id") == F.col("h_query"))
            & (F.col("vec_id") == F.col("h_vec")),
            "left_semi",
        ).count()
        return hits / exact.count()

    stale_med = w50.stale_medoids_table(spark, SF)
    stale_edges = w26._l1_edges_from(spark, SF, stale_med)
    stale_res = w26._hnsw_search(
        spark, SF, medoids=stale_med, l1_edges=stale_edges
    )
    fresh_res = all_specs()["q_sim_ann_hnsw"].fn(spark, SF)
    r_stale, r_fresh = recall(stale_res), recall(fresh_res)
    assert r_fresh >= r_stale, (r_fresh, r_stale)
    assert r_fresh >= 0.8  # the refreshed index is the gated searcher
