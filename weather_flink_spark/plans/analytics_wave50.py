"""Wave-50 operator (round 8): HNSW index maintenance — the
medoid/highway REFRESH job (r7 verdict task #7).

The streaming index lifecycle so far: s_stream_hnsw_insert (write
path — per-node edges computed against the static prefix index, batch-
composition-independent) and s_stream_ann_search (read path) — but the
insert path deliberately never rebalances structure: coarse medoids
and the highway clique stay whatever the last batch build produced
("medoid/highway refresh = periodic compaction",
analytics_wave26.hnsw_insert_frame). This entry IS that compaction:

- ``q_sim_ann_hnsw_refresh`` — treat the newest 20% of vec_ids as one
  ingest epoch (the repo's delta-batch convention, q_dedup_incremental)
  inserted since the last rebuild. The STALE coarse structure elects
  each cell's medoid among pre-epoch coarse nodes only; the REFRESH
  re-elects over the full grown corpus (exactly the batch builder's
  rule — min centroid distance, vec_id tie-break). Output: one row per
  cell with the stale and refreshed medoid, a changed flag, and the
  epoch's coarse-node arrivals — the bounded (<= KMEANS_K rows) work
  order a production service would apply atomically.

Search-recall parity is proven in tests/test_analytics_wave50.py: the
SAME 2-layer searcher (analytics_wave26._hnsw_search) runs once
against the stale structures (stale medoids + coarse topology rebuilt
from them via _l1_edges_from) and once against the refreshed ones, and
refreshed recall vs the shared exact ground truth must be >= stale.

Scale: medoid election is one window pass over the coarse subsample
(~25% of corpus), the refresh artifact is <= KMEANS_K rows, and the
highway rebuild is the k^2-bounded clique — at 100 TB this runs like
any compaction job (per-partition election feeding a bounded reduce),
never corpus-pairwise.

Reference parity note: the reference implements no similarity search
(empty plan body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.plans.analytics_wave26 import (
    _L1_PRED_DUCK,
    _L1_PRED_SPARK,
)
from weather_flink_spark.plans.registry import register


def _epoch_cut_col(final: DataFrame) -> DataFrame:
    """1-row (cut) frame: first vec_id of the newest-20% ingest epoch
    (the q_dedup_incremental delta convention)."""
    return final.agg(F.expr("max(vec_id) * 4 div 5").alias("cut"))


def stale_medoids_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell coarse medoids elected over PRE-EPOCH nodes only
    (vec_id < cut) — the structure the insert path left stale."""
    from weather_flink_spark.plans.analytics_wave4 import (
        kmeans_final_assignment,
    )

    _, final = kmeans_final_assignment(spark, sf_dir)
    cut = _epoch_cut_col(final)
    w = Window.partitionBy("cid").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    return (
        final.filter(F.expr(_L1_PRED_SPARK))
        .crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") < F.col("cut"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("cid").alias("cell"), F.col("vec_id").alias("node"))
    )


def _refresh_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave4 import KMEANS_ITERS
    from weather_flink_spark.plans.llm_extra import ivf_assigned_cte

    pred = _L1_PRED_DUCK.replace("vec_id", "a.vec_id")
    return f"""
        WITH {ivf_assigned_cte()},
        cut AS (SELECT MAX(vec_id) * 4 // 5 AS c FROM embeddings),
        coarse AS MATERIALIZED (
            SELECT a.vec_id, a.cid, a.d2 FROM a{KMEANS_ITERS} a
            WHERE {pred}
        ),
        fresh AS (
            SELECT cid AS cell, vec_id AS node FROM (
                SELECT cid, vec_id, ROW_NUMBER() OVER (
                    PARTITION BY cid ORDER BY d2 ASC, vec_id ASC) AS rk
                FROM coarse
            ) WHERE rk = 1
        ),
        stale AS (
            SELECT cid AS cell, vec_id AS node FROM (
                SELECT cid, vec_id, ROW_NUMBER() OVER (
                    PARTITION BY cid ORDER BY d2 ASC, vec_id ASC) AS rk
                FROM coarse WHERE vec_id < (SELECT c FROM cut)
            ) WHERE rk = 1
        ),
        arrivals AS (
            SELECT cid AS cell, CAST(COUNT(*) AS BIGINT) AS n_new_coarse
            FROM coarse WHERE vec_id >= (SELECT c FROM cut)
            GROUP BY cid
        )
        SELECT f.cell,
               s.node AS stale_node,
               f.node AS refreshed_node,
               (s.node IS NULL OR s.node <> f.node) AS medoid_changed,
               COALESCE(a.n_new_coarse, 0) AS n_new_coarse
        FROM fresh f
        LEFT JOIN stale s ON s.cell = f.cell
        LEFT JOIN arrivals a ON a.cell = f.cell
    """


@register(
    "q_sim_ann_hnsw_refresh",
    oracle=_refresh_oracle(),
    doc=(
        "HNSW medoid/highway refresh — the periodic-compaction half "
        "of the streaming-index lifecycle (insert path "
        "s_stream_hnsw_insert deliberately defers structural "
        "rebalance): treating the newest 20% of vec_ids as the ingest "
        "epoch, re-elect every cell's coarse medoid over the grown "
        "corpus (min centroid distance, vec_id tie-break — the batch "
        "builder's exact rule) vs the stale pre-epoch election, "
        "emitting the <= KMEANS_K-row work order (stale node, "
        "refreshed node, changed flag, epoch coarse arrivals). "
        "Search-recall on the refreshed structures is gated >= stale "
        "in tests (same searcher, medoid/topology override). Scale: "
        "one window pass over the ~25% coarse subsample + a bounded "
        "reduce; the highway rebuild is the k^2 clique."
    ),
    tags=("similarity", "ann", "hnsw", "layout", "maintenance"),
)
def q_sim_ann_hnsw_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave26 import l1_medoids_table
    from weather_flink_spark.plans.analytics_wave4 import (
        kmeans_final_assignment,
    )

    _, final = kmeans_final_assignment(spark, sf_dir)
    cut = _epoch_cut_col(final)
    fresh = l1_medoids_table(spark, sf_dir)
    stale = stale_medoids_table(spark, sf_dir).withColumnRenamed(
        "node", "stale_node"
    )
    arrivals = (
        final.filter(F.expr(_L1_PRED_SPARK))
        .crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") >= F.col("cut"))
        .groupBy(F.col("cid").alias("cell"))
        .agg(F.count("*").cast("bigint").alias("n_new_coarse"))
    )
    return (
        fresh.withColumnRenamed("node", "refreshed_node")
        .join(F.broadcast(stale), "cell", "left")
        .join(F.broadcast(arrivals), "cell", "left")
        .select(
            "cell",
            "stale_node",
            "refreshed_node",
            (
                F.col("stale_node").isNull()
                | (F.col("stale_node") != F.col("refreshed_node"))
            ).alias("medoid_changed"),
            F.coalesce(F.col("n_new_coarse"), F.lit(0).cast("bigint")).alias(
                "n_new_coarse"
            ),
        )
    )
