"""Arrow-vectorized ANN must agree with the expression-based brute force."""

from __future__ import annotations

import pytest

from weather_flink_spark.io import load
from weather_flink_spark.operators.vector_search import cosine_topk_arrow
from weather_flink_spark.plans.registry import all_specs


def test_arrow_topk_matches_expression_bruteforce(spark, sf_dir):
    expr_rows = all_specs()["q_sim_cosine_topk"].fn(spark, sf_dir).collect()
    arrow_rows = cosine_topk_arrow(
        load(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    ).collect()

    def key(rows):
        return {(r["query_id"], r["k_rank"]): (r["vec_id"], r["cosine"]) for r in rows}

    e, a = key(expr_rows), key(arrow_rows)
    assert set(e) == set(a)
    for kk in e:
        assert e[kk][0] == a[kk][0], f"rank {kk}: id {e[kk][0]} != {a[kk][0]}"
        assert e[kk][1] == pytest.approx(a[kk][1], abs=1e-9)


def test_arrow_topk_partition_safety(spark, sf_dir):
    """Result is invariant to the input partitioning (map-side top-k is
    a correct combiner)."""
    emb = load(spark, sf_dir, "embeddings")
    a = {
        (r["query_id"], r["k_rank"]): r["vec_id"]
        for r in cosine_topk_arrow(emb.repartition(17), [0, 1], k=5).collect()
    }
    b = {
        (r["query_id"], r["k_rank"]): r["vec_id"]
        for r in cosine_topk_arrow(emb.coalesce(1), [0, 1], k=5).collect()
    }
    assert a == b


def test_gemm_assignment_matches_expression_path(spark, sf_dir):
    """assign_cells_gemm (BLAS kernel) must produce the exact cell per
    vector that the Catalyst expression fold produces — including the
    smallest-cid tie-break."""
    from pyspark.sql import functions as F

    from weather_flink_spark.operators.vector_search import assign_cells_gemm
    from weather_flink_spark.plans.analytics_wave4 import kmeans_final_assignment
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table

    cent, _ = kmeans_final_assignment(spark, sf_dir)
    model = [(r["cid"], r["c"]) for r in cent.collect()]
    g = assign_cells_gemm(load(spark, sf_dir, "embeddings"), model)
    x = ivf_assigned_table(spark, sf_dir).select(
        "vec_id", F.col("cell").alias("cell_expr")
    )
    joined = g.join(x, "vec_id")
    assert joined.count() == x.count()
    assert joined.filter("cell <> cell_expr").count() == 0
