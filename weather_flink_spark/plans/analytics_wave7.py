"""Seventh wave: longitudinal + resampling analytics (SURVEY.md §2-C).

- ``q_orders_cohort_ltv``    — cohort lifetime-value curves: customers
                               grouped by first-order month, cumulative
                               revenue per cohort by months-since-first
                               (the retention-economics companion to
                               q_events_retention's activity matrix).
- ``q_stats_bootstrap_ci``   — distributed Poisson bootstrap: B
                               deterministic resamples of the order-
                               value mean via seeded-hash Poisson(1)
                               weights — the classic way to bootstrap
                               a dataset too large to resample by
                               index (each row draws its own weight
                               per replicate; no shuffle of the data,
                               no driver-side resampling).

Parity discipline as everywhere: seeded md5-derived randomness (never
rand()), DECIMAL-exact money sums, identical aliases both engines.
The reference has no batch analytics surface (empty plan body,
WeatherProcessingJobPlan.java:9-11); these are §2-C north-star rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Cohort lifetime value
# ---------------------------------------------------------------------------


@register(
    "q_orders_cohort_ltv",
    oracle="""
        WITH first_order AS (
            SELECT o_custkey,
                   CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort
            FROM orders GROUP BY o_custkey
        ),
        sizes AS (
            SELECT cohort, COUNT(*) AS cohort_size
            FROM first_order GROUP BY cohort
        ),
        rev AS (
            SELECT f.cohort,
                   (EXTRACT(YEAR FROM o.o_orderdate) * 12
                      + EXTRACT(MONTH FROM o.o_orderdate))
                   - (EXTRACT(YEAR FROM f.cohort) * 12
                      + EXTRACT(MONTH FROM f.cohort)) AS age_months,
                   COUNT(*) AS n_orders,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev_dec
            FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
            GROUP BY 1, 2
        )
        SELECT r.cohort, CAST(r.age_months AS BIGINT) AS age_months,
               r.n_orders,
               CAST(r.rev_dec AS DOUBLE) AS revenue,
               CAST(SUM(r.rev_dec) OVER (PARTITION BY r.cohort
                        ORDER BY r.age_months ASC) AS DOUBLE) AS cum_revenue,
               s.cohort_size,
               CAST(SUM(r.rev_dec) OVER (PARTITION BY r.cohort
                        ORDER BY r.age_months ASC) AS DOUBLE)
                   / s.cohort_size AS ltv_per_customer
        FROM rev r JOIN sizes s ON s.cohort = r.cohort
    """,
    doc=(
        "Cohort LTV curves: cohort = first-order month, age = months "
        "since cohort, cumulative DECIMAL revenue per cohort divided by "
        "cohort size. Two partial-aggregated rollups (first-order per "
        "customer, revenue per cohort-age) + one per-cohort running-sum "
        "window over the tiny cohort×age grid — the fact table is never "
        "windowed. The running sum accumulates DECIMAL and casts at the "
        "edge, so the cumulative column is order-independent exact."
    ),
    tags=("analytics", "cohort", "window"),
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    months = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    rev = (
        o.join(first, "o_custkey")
        .groupBy(
            "cohort",
            (months(F.col("o_orderdate")) - months(F.col("cohort"))).alias("age_months"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec"),
        )
    )
    w = Window.partitionBy("cohort").orderBy(F.col("age_months").asc())
    return (
        rev.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            F.col("age_months").cast("bigint").alias("age_months"),
            "n_orders",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.sum("rev_dec").over(w).cast("double").alias("cum_revenue"),
            "cohort_size",
            (F.sum("rev_dec").over(w).cast("double") / F.col("cohort_size")).alias(
                "ltv_per_customer"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Distributed deterministic Poisson bootstrap
# ---------------------------------------------------------------------------

_B = 40  # bootstrap replicates
# Poisson(1) CDF thresholds for the inverse-CDF draw (identical literals
# in both engines; weight capped at 6, P(>6) ≈ 8e-5)
_POIS = (
    "CASE WHEN {u} < 0.36787944117144233 THEN 0 "
    "WHEN {u} < 0.73575888234288467 THEN 1 "
    "WHEN {u} < 0.91969860292860584 THEN 2 "
    "WHEN {u} < 0.98101184312384615 THEN 3 "
    "WHEN {u} < 0.99634015317265629 THEN 4 "
    "WHEN {u} < 0.99940581518241833 THEN 5 ELSE 6 END"
)
_U_SPARK = (
    "(cast(conv(substring(md5(concat('boot:', cast(b as string), ':',"
    " cast(o_orderkey as string))), 1, 7), 16, 10) as double) / 268435456.0)"
)
_U_DUCK = (
    "(CAST(CAST('0x' || md5('boot:' || CAST(b AS VARCHAR) || ':'"
    " || CAST(o_orderkey AS VARCHAR))[1:7] AS BIGINT) AS DOUBLE) / 268435456.0)"
)


@register(
    "q_stats_bootstrap_ci",
    oracle=f"""
        WITH draws AS (
            SELECT b, o_orderkey, o_totalprice,
                   {_POIS.format(u=_U_DUCK)} AS w
            FROM orders CROSS JOIN (SELECT UNNEST(range(1, {_B + 1})) AS b)
        )
        SELECT b,
               CAST(SUM(w) AS BIGINT) AS n_eff,
               CAST(SUM(CAST(w * o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   / SUM(w) AS resample_mean
        FROM draws
        GROUP BY b
    """,
    doc=(
        "Distributed Poisson bootstrap of the mean order value: each of "
        "B=40 replicates draws a deterministic Poisson(1) weight per row "
        "(inverse-CDF over a seeded md5 uniform — reruns, engines and "
        "cluster sizes agree; rand() would not), and the replicate "
        "statistic is the weight-weighted DECIMAL mean. This is how you "
        "bootstrap 100 TB: no index resampling, no data movement — one "
        "map-side weight column per replicate and a B-key aggregation "
        "whose shuffle is B partial rows per task. Downstream, the "
        "percentiles of resample_mean give the CI."
    ),
    tags=("stats", "bootstrap", "sampling"),
)
def q_stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    draws = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.expr(f"sequence(1, {_B})")).alias("b"),
    ).select("b", "o_orderkey", "o_totalprice", F.expr(_POIS.format(u=_U_SPARK)).alias("w"))
    return draws.groupBy("b").agg(
        F.sum("w").cast("bigint").alias("n_eff"),
        (
            F.sum((F.col("w") * F.col("o_totalprice")).cast("decimal(18,6)")).cast(
                "double"
            )
            / F.sum("w")
        ).alias("resample_mean"),
    )
