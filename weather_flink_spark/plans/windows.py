"""Window-function queries (SURVEY.md §2-C "Window functions" block).

Determinism discipline: every window ORDER BY carries a unique
tiebreaker (primary key) so rank/row_number/lag are reproducible and
oracle-comparable. Running sums go through DECIMAL inside the window
frame: Spark accumulates sequentially while DuckDB may use a segment
tree, so float summation order differs between engines — decimal makes
the result order-independent and therefore identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_win_rank",
    oracle="""
        SELECT
            o_custkey,
            o_orderkey,
            o_totalprice,
            RANK()       OVER w AS price_rank,
            DENSE_RANK() OVER w AS price_dense_rank,
            ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
    doc="rank/dense_rank/row_number per customer by order price.",
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    wrn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.row_number().over(wrn).alias("rn"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
        SELECT
            user_id,
            event_id,
            ts,
            event_type,
            LAG(event_type)  OVER w AS prev_type,
            LEAD(event_type) OVER w AS next_type,
            LAG(ts)          OVER w AS prev_ts,
            CAST(DATE_DIFF('microsecond', LAG(ts) OVER w, ts) AS BIGINT) AS us_since_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    doc="lag/lead analytics over per-user event sequences; inter-arrival gap in ms.",
    tags=("window",),
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        prev_ts.alias("prev_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).alias("us_since_prev"),
    )


@register(
    "q_win_frame_running",
    oracle="""
        SELECT
            user_id,
            event_id,
            ts,
            value,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) AS running_sum,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
            ) AS DOUBLE)
            / COUNT(*) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
            ) AS moving_avg3
        FROM events
    """,
    doc="Running sum + 3-row moving average with explicit frames (decimal-exact).",
    tags=("window",),
)
def q_win_frame_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ob = [F.col("ts").asc(), F.col("event_id").asc()]
    w_run = (
        Window.partitionBy("user_id").orderBy(*ob).rowsBetween(Window.unboundedPreceding, 0)
    )
    w_m3 = Window.partitionBy("user_id").orderBy(*ob).rowsBetween(-2, 0)
    v = F.col("value").cast("decimal(18,6)")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(v).over(w_run).cast("double").alias("running_sum"),
        (F.sum(v).over(w_m3).cast("double") / F.count("*").over(w_m3)).alias("moving_avg3"),
    )


@register(
    "q_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn AS k_rank
        FROM (
            SELECT
                o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC
                ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    doc="Top-3 orders per customer via ranked window + filter (scales: single shuffle on group key).",
    tags=("window", "topk"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("k_rank", F.row_number().over(w))
        .filter(F.col("k_rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "k_rank")
    )


@register(
    "q_win_distribution",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               NTILE(4) OVER w AS quartile,
               CUME_DIST() OVER w AS cume,
               PERCENT_RANK() OVER w AS pct_rank,
               FIRST_VALUE(c_custkey) OVER w AS richest_in_nation,
               LAST_VALUE(c_custkey) OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS poorest_in_nation
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc=(
        "Distribution window functions: ntile quartiles, cume_dist, "
        "percent_rank, first/last_value with explicit full frame (the "
        "default frame would stop at CURRENT ROW for last_value)."
    ),
    tags=("window",),
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.first("c_custkey").over(w).alias("richest_in_nation"),
        F.last("c_custkey").over(w_full).alias("poorest_in_nation"),
    )


@register(
    "q_win_ignore_nulls",
    oracle="""
        WITH sparse AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
            FROM events
        )
        SELECT user_id, event_id, ts, v,
               LAG(v IGNORE NULLS) OVER w AS last_observed,
               LEAD(v IGNORE NULLS) OVER w AS next_observed,
               nth_value(v, 2 IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_observed
        FROM sparse
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    doc=(
        "IGNORE NULLS navigation over a sparsified gauge (every third "
        "observation nulled): lag/lead skip the gaps (the LOCF / "
        "next-observation-carried-backward primitives) and nth_value "
        "picks the second real observation of the series. Same window "
        "sort as any lag/lead — null-skipping is frame-local state."
    ),
    tags=("window", "nulls"),
)
def q_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sparse = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return sparse.select(
        "user_id",
        "event_id",
        "ts",
        "v",
        # PySpark's lag/lead helpers lack the ignoreNulls arg; SQL has it
        F.expr(
            "lag(v) IGNORE NULLS OVER "
            "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"
        ).alias("last_observed"),
        F.expr(
            "lead(v) IGNORE NULLS OVER "
            "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"
        ).alias("next_observed"),
        F.nth_value("v", 2, ignoreNulls=True).over(w_full).alias("second_observed"),
    )


@register(
    "q_win_ratio_to_report",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               o_totalprice
               / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                      OVER (PARTITION BY o_custkey) AS DOUBLE)
                   AS share_of_customer,
               o_totalprice
               / CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders)
                      AS DOUBLE) AS share_of_total
        FROM orders
    """,
    doc=(
        "Ratio-to-report: each order's share of its customer's spend "
        "(frameless partition window) and of global spend (scalar "
        "aggregate broadcast). Denominators are decimal-exact sums "
        "surfaced as double, so the per-row division is deterministic "
        "on both engines. The global share costs one tiny scalar "
        "subquery, not a partitionless window over the fact table."
    ),
    tags=("window", "ratio"),
)
def q_win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    w_cust = Window.partitionBy("o_custkey")
    total = o.agg(F.sum(dec).cast("double").alias("grand_total"))
    return (
        o.join(F.broadcast(total))
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            (F.col("o_totalprice") / F.sum(dec).over(w_cust).cast("double")).alias(
                "share_of_customer"
            ),
            (F.col("o_totalprice") / F.col("grand_total")).alias("share_of_total"),
        )
    )
