"""Wave-38 operator (round 6, continued): association rules.

- ``q_orders_assoc_rules`` — market-basket association rules (Agrawal
  & Srikant 1994's output shape): for every co-purchased part pair
  above the support floor, BOTH directed rules A→B and B→A with
  confidence, lift, and leverage — the directional completion of
  q_basket_pairs_lift (lift is symmetric; confidence is not, and the
  direction is what a recommender acts on). Rides the session-cached
  DISTINCT (order, part) edge table; the pair phase is the same
  order-keyed self-join, and every rule metric reduces to exact
  BIGINT counts with one double expression at the end
  (leverage keeps an exact integer numerator co·N − c_A·c_B over N²).

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import register

_AR_MIN_CO = 3  # support floor on pair co-occurrence


@register(
    "q_orders_assoc_rules",
    oracle=f"""
        WITH basket AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        n_ord AS (
            SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
            FROM basket
        ),
        item AS (
            SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
            FROM basket GROUP BY l_partkey
        ),
        pairs AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                   CAST(COUNT(*) AS BIGINT) AS co
            FROM basket a JOIN basket b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {_AR_MIN_CO}
        ),
        both_dirs AS (
            SELECT pa AS antecedent, pb AS consequent, co FROM pairs
            UNION ALL
            SELECT pb, pa, co FROM pairs
        )
        SELECT r.antecedent, r.consequent, r.co,
               ia.c AS c_antecedent, ic.c AS c_consequent,
               ROUND(CAST(r.co AS DOUBLE) / ia.c, 6) AS confidence,
               ROUND(CAST(n.n * r.co AS DOUBLE) / (ia.c * ic.c), 6) AS lift,
               ROUND(CAST(r.co * n.n - ia.c * ic.c AS DOUBLE)
                     / CAST(n.n * n.n AS DOUBLE), 9) AS leverage
        FROM both_dirs r
        JOIN item ia ON ia.l_partkey = r.antecedent
        JOIN item ic ON ic.l_partkey = r.consequent
        CROSS JOIN n_ord n
    """,
    doc=(
        "Market-basket association rules over co-purchased parts: for "
        f"every pair with co-occurrence >= {_AR_MIN_CO}, BOTH directed "
        "rules with confidence (co/c_A — the directional signal a "
        "recommender acts on), lift (symmetric association strength), "
        "and leverage (co/N − expected, kept as the exact integer "
        "numerator co·N − c_A·c_B over N²). Rides the session-cached "
        "DISTINCT (order, part) edge table shared with triangles / "
        "adamic-adar / basket-lift; the pair phase is the same "
        "order-keyed self-join (pair fan-out bounded by basket size), "
        "item supports are one partial-aggregated groupBy, and every "
        "metric is exact-integer until one final double expression."
    ),
    tags=("analytics", "mining", "join"),
)
def q_orders_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import order_part_edges_table

    basket = order_part_edges_table(spark, sf_dir)
    n_ord = basket.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n")
    )
    item = basket.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("c")
    )
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count("*").cast("bigint").alias("co"))
        .where(F.col("co") >= _AR_MIN_CO)
    )
    both = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "co",
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "co",
        )
    )
    ia = item.select(
        F.col("l_partkey").alias("antecedent"), F.col("c").alias("c_antecedent")
    )
    ic = item.select(
        F.col("l_partkey").alias("consequent"),
        F.col("c").alias("c_consequent"),
    )
    return (
        both.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "antecedent",
            "consequent",
            "co",
            "c_antecedent",
            "c_consequent",
            F.round(
                F.col("co").cast("double") / F.col("c_antecedent"), 6
            ).alias("confidence"),
            F.round(
                (F.col("n") * F.col("co")).cast("double")
                / (F.col("c_antecedent") * F.col("c_consequent")),
                6,
            ).alias("lift"),
            F.round(
                (
                    F.col("co") * F.col("n")
                    - F.col("c_antecedent") * F.col("c_consequent")
                ).cast("double")
                / (F.col("n") * F.col("n")).cast("double"),
                9,
            ).alias("leverage"),
        )
    )
