"""Wave-41 operator (round 6, continued): Gini concentration.

- ``q_orders_gini`` — the Gini coefficient of customer revenue
  concentration (G = Σ(2i − n − 1)·x_(i) / (n·Σx) over ascending
  order statistics): THE inequality summary behind every
  "top X% of customers drive Y% of revenue" statement, and the
  scalar complement of q_orders_abc_pareto's banded view. Revenue
  quantizes to exact integer cents, the global ascending rank comes
  from the two-pass range-partitioned primitive
  (operators/global_order.attach_global_row_number — no
  single-task sort), and the rank-weighted sum is exact
  DECIMAL(38,0) (it grows ~n²·avg_cents, past int64 near sf10) with
  one double division at the end.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_orders_gini",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                              * 100, 0) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT cents,
                   ROW_NUMBER() OVER (
                       ORDER BY cents ASC, o_custkey ASC) AS i,
                   COUNT(*) OVER () AS n
            FROM rev
        )
        SELECT MAX(n) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               -- wsum grows ~n^2*avg_cents (> int64 around sf10):
               -- accumulate in DECIMAL(38,0) on BOTH engines so the
               -- 'exact integer numerator' claim holds at any SF
               ROUND(CAST(SUM(CAST(2 * i - n - 1 AS DECIMAL(19,0))
                               * CAST(cents AS DECIMAL(19,0))) AS DOUBLE)
                     / (MAX(n) * CAST(SUM(cents) AS DOUBLE)), 9) AS gini
        FROM ranked
    """,
    doc=(
        "Gini coefficient of customer revenue concentration "
        "(G = Σ(2i−n−1)·x_(i) / (n·Σx), ascending order statistics) — "
        "the scalar inequality summary behind 'top X% drive Y%', "
        "complementing q_orders_abc_pareto's banded view. Parity: "
        "per-customer revenue is an exact DECIMAL sum quantized to "
        "integer CENTS (a bigint), the rank weight (2i−n−1) is "
        "integer, so the whole numerator is exact DECIMAL(38,0) — not "
        "BIGINT, which Σ(2i−n−1)·cents (~n²·avg_cents) would silently "
        "wrap around sf10 — with ONE "
        "double division at the end. Scale: the global ascending rank "
        "uses the two-pass range-partitioned row-number primitive "
        "(operators/global_order) — the oracle's partitionless window "
        "exists only on the DuckDB side; the Spark plan has no "
        "single-task sort."
    ),
    tags=("analytics", "statistics", "global-order"),
)
def q_orders_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.global_order import (
        attach_global_row_number,
    )

    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100, 0
        )
        .cast("bigint")
        .alias("cents")
    )
    ranked = attach_global_row_number(
        rev, [F.col("cents").asc(), F.col("o_custkey").asc()], "i"
    )
    tot = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    num = ranked.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n_customers"),
        F.max("total_cents").alias("total_cents"),
        # DECIMAL(19,0)x(19,0) -> (38,0): the rank-weighted sum grows
        # ~n^2*avg_cents, past int64 near sf10; decimal-38 holds to ~1e38
        F.sum(
            (F.lit(2) * F.col("i") - F.col("n") - F.lit(1)).cast(
                "decimal(19,0)"
            )
            * F.col("cents").cast("decimal(19,0)")
        ).alias("wsum"),
    )
    return num.select(
        "n_customers",
        "total_cents",
        F.round(
            F.col("wsum").cast("double")
            / (F.col("n_customers") * F.col("total_cents").cast("double")),
            9,
        ).alias("gini"),
    )
