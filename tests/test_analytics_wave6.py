"""Wave-6 semantics beyond the oracle hash (incremental MV, BPE, recall)."""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_mv_incremental_equals_direct_recompute(spark):
    """merge(partial_hist, partial_delta) must be row-identical to the
    one-shot aggregation — including customers present on only one side
    of the cutoff."""
    mv = all_specs()["q_mv_incremental_agg"].fn(spark, SF)
    o = load(spark, SF, "orders")
    direct = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("revenue"),
        F.max("o_orderdate").alias("last_order"),
    )
    assert mv.exceptAll(direct).count() == 0
    assert direct.exceptAll(mv).count() == 0
    # the cutoff actually splits the data (both slices non-empty)
    cutoff = "2000-01-01"
    assert o.where(F.col("o_orderdate") < cutoff).count() > 0
    assert o.where(F.col("o_orderdate") >= cutoff).count() > 0


def test_bpe_pairs_ranked_and_weighted(spark):
    rows = all_specs()["q_text_bpe_pairs"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 30
    counts = [r["pair_count"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)
    # weighting check: a pair inside the most frequent word must appear
    # with count >= that word's corpus frequency
    d = load(spark, SF, "documents")
    top_word, freq = (
        d.select(F.explode(F.expr("filter(split(text, ' '), t -> t <> '')")).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w"))
        .first()
    )
    if len(top_word) >= 2:
        pair = top_word[:2]
        hit = [r for r in rows if r["pair"] == pair]
        if hit:
            assert hit[0]["pair_count"] >= freq


def test_ann_recall_bounded_and_meaningful(spark):
    rows = all_specs()["q_sim_ann_recall"].fn(spark, SF).collect()
    assert len(rows) == 5  # one row per query
    for r in rows:
        assert r["k"] == 5
        assert 0 <= r["n_hit"] <= r["k"]
        assert abs(r["recall_at_k"] - r["n_hit"] / r["k"]) < 1e-12


@pytest.mark.slow
def test_semantic_dedup_two_stage_equals_single_stage_fold(spark):
    """r11 rewrite proof at the REFINED-cell granularity: force a low
    bounded_cells bound at fixture scale (so the sub-cell split is
    live, as at sf0.1) and require the two-stage GEMM-prefilter +
    exact-fold pipeline to emit EXACTLY the single-stage fold's pairs
    — same rows, same cosines, bit for bit. (The sf0.001/0.01 oracles
    already pin the unrefined path; the full-scale twin was verified
    bit-identical at sf0.1 before the rewrite landed.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from weather_flink_spark.operators.semdedup import bounded_cells
    from weather_flink_spark.plans.analytics_wave6 import (
        SEMANTIC_DUP_THRESHOLD,
        semantic_dedup_pairs,
    )
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table
    from weather_flink_spark.plans.llm_pipeline import dot_col

    coarse = ivf_assigned_table(spark, SF)
    assigned = bounded_cells(coarse, bound=32, target=16)
    # the forced split must actually engage (negative refined ids)
    assert assigned.filter(F.col("cell") < 0).count() > 0

    two_stage = semantic_dedup_pairs(assigned, coarse)

    a, b = assigned.alias("a"), assigned.alias("b")
    cos_ab = dot_col(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.cell").alias("cell"),
            F.col("a.vec_id").alias("keep_cand"),
            F.col("b.vec_id").alias("drop_id"),
            cos_ab.alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMANTIC_DUP_THRESHOLD)
    )
    w = Window.partitionBy("drop_id").orderBy(F.col("keep_cand").asc())
    single_stage = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cell", F.col("keep_cand").alias("keep_id"), "drop_id", "cosine")
    )
    assert two_stage.count() == single_stage.count() > 0
    assert two_stage.exceptAll(single_stage).count() == 0
    assert single_stage.exceptAll(two_stage).count() == 0
