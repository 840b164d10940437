"""Wave-67 operator (round 9): Misra-Gries heavy-hitters summary —
the deterministic frequent-items sketch beside the CMS tier
(q_text_heavy_hitters_cms).

``q_agg_heavy_hitters_mg``: the k=16-counter Misra-Gries summary of
(user_id, event_type) activity, built by the BATCH compaction that the
mergeable-summaries literature shows is equivalent to merging
per-partition MG sketches (Agarwal et al. 2013 / Berinde et al. 2010):

    T   = the (k+1)-th largest exact count (0 when <= k items)
    out = every item with count > T, est = count - T

This gives the exact Misra-Gries guarantees deterministically —
independent of partitioning and arrival order, which a streamed MG is
NOT (its counters depend on interleaving; the batch compaction is the
canonical order-free result the merged sketch converges to):

    est <= true <= est + T,   T <= n/(k+1),   <= k rows survive,
    every item with true > n/(k+1) is present.

The exact count rides along for error accounting (the HLL-entry
convention), and the guarantee inequalities are tested.

Scale: one partial-aggregated groupBy builds the count table; the
threshold is a sort+limit order statistic (TakeOrdered, never a
partitionless window); the summary is <= k rows — the persisted
artifact a per-shard rollup job would re-merge upward.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_MG_K = 16


def _mg_oracle() -> str:
    return f"""
        WITH c AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id, event_type
        ),
        t AS (
            SELECT CAST(COALESCE(MAX(cnt), 0) AS BIGINT) AS thr
            FROM (
                SELECT cnt FROM c
                ORDER BY cnt DESC, user_id ASC, event_type ASC
                LIMIT 1 OFFSET {_MG_K}
            )
        )
        SELECT c.user_id, c.event_type,
               CAST(c.cnt - t.thr AS BIGINT) AS est_count,
               t.thr AS threshold,
               c.cnt AS exact_count
        FROM c CROSS JOIN t
        WHERE c.cnt > t.thr
    """


@register(
    "q_agg_heavy_hitters_mg",
    oracle=_mg_oracle(),
    doc=(
        "Misra-Gries k=16 heavy-hitters summary over (user, "
        "event_type) activity (r9) — the deterministic frequent-items "
        "sketch beside CMS: batch compaction T = (k+1)-th largest "
        "count, est = count - T for survivors, which is the "
        "order-free result merged per-partition MG sketches converge "
        "to (Agarwal 2013). Guarantees tested: est <= true <= est+T, "
        "T <= n/(k+1), <= k survivors, every item above n/(k+1) "
        "present. One partial-agg groupBy + a sort+limit order "
        "statistic (never a partitionless window); the <= k-row "
        "summary is the persisted rollup artifact. Exact count rides "
        "along for error accounting (the HLL-entry convention)."
    ),
    tags=("aggregate", "sketch", "heavy-hitters"),
)
def q_agg_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    # threshold = the (k+1)-th largest count (the min over the
    # deterministic top-(k+1) — same value as LIMIT 1 OFFSET k in the
    # oracle), 0 when <= k items exist
    n_top = c.orderBy(
        F.col("cnt").desc(), F.col("user_id").asc(), F.col("event_type").asc()
    ).limit(_MG_K + 1)
    thr = (
        n_top.agg(
            F.count("*").alias("m"),
            F.min("cnt").alias("mn"),
        )
        .select(
            F.when(F.col("m") > _MG_K, F.col("mn"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("thr")
        )
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("cnt") > F.col("thr"))
        .select(
            "user_id",
            "event_type",
            (F.col("cnt") - F.col("thr")).cast("bigint").alias("est_count"),
            F.col("thr").alias("threshold"),
            F.col("cnt").alias("exact_count"),
        )
    )
