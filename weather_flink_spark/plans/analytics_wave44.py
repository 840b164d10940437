"""Wave-44 operators (round 7): cohort retention + HITS.

- ``q_customer_cohort_retention`` — the month-cohort retention matrix
  (cohort = month of first order; cell (cohort, k) = share of the
  cohort active k months later): THE standard growth-analytics table,
  and the one every warehouse team rebuilds by hand. Integer month
  arithmetic (y*12+m), distinct-customer counts, one double division
  per cell.
- ``q_graph_hits`` — Kleinberg's HITS (1999) on the bipartite
  order-part graph, two UNROLLED mutual-reinforcement iterations in
  exact BIGINT (a1 = part degree; h1 = Σ a1 over the order's parts;
  a2 = Σ h1 over the part's orders): authority-ranked parts with a
  final single double normalization by the max. Complements
  q_graph_pagerank (random-walk centrality) with the hubs/authorities
  decomposition — on a purchase graph, "parts that big diverse
  baskets concentrate on".

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

_COHORT_MAX_K = 11  # months after first order tracked (one year)
_HITS_TOP = 20


@register(
    "q_customer_cohort_retention",
    oracle=f"""
        WITH act AS (
            SELECT DISTINCT o_custkey,
                   YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS m
            FROM orders
        ),
        first AS (
            SELECT o_custkey, MIN(m) AS m0 FROM act GROUP BY o_custkey
        ),
        sz AS (
            SELECT m0, COUNT(*) AS cohort_size FROM first GROUP BY m0
        ),
        cells AS (
            SELECT f.m0, a.m - f.m0 AS k,
                   COUNT(DISTINCT a.o_custkey) AS n_active
            FROM act a JOIN first f ON f.o_custkey = a.o_custkey
            WHERE a.m - f.m0 <= {_COHORT_MAX_K}
            GROUP BY f.m0, a.m - f.m0
        )
        SELECT CAST(c.m0 // 12 AS BIGINT) AS cohort_year,
               CAST(c.m0 % 12 + 1 AS BIGINT) AS cohort_month,
               CAST(c.k AS BIGINT) AS k,
               s.cohort_size,
               c.n_active,
               ROUND(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6)
                   AS retention
        FROM cells c JOIN sz s ON s.m0 = c.m0
    """,
    doc=(
        "Month-cohort retention matrix: cohort = month of FIRST order "
        "per customer, cell (cohort, k) = distinct customers active k "
        "months later / cohort size, k <= 11 — the growth-analytics "
        "standard. Parity: months as exact integers (y*12+m), "
        "distinct counts, ONE double division per cell. Scale: one "
        "distinct-pass + one min-groupBy + one join keyed on "
        "customer, matrix bounded by months² — never data-sized."
    ),
    tags=("orders", "analytics", "retention"),
)
def q_customer_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    act = o.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("m"),
    ).distinct()
    first = act.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sz = first.groupBy("m0").agg(F.count("*").alias("cohort_size"))
    cells = (
        act.join(first, "o_custkey")
        .withColumn("k", F.col("m") - F.col("m0"))
        .filter(F.col("k") <= _COHORT_MAX_K)
        .groupBy("m0", "k")
        .agg(F.countDistinct("o_custkey").alias("n_active"))
    )
    return (
        cells.join(sz, "m0")
        .select(
            (F.col("m0") / 12).cast("bigint").alias("cohort_year"),
            (F.col("m0") % 12 + 1).cast("bigint").alias("cohort_month"),
            F.col("k").cast("bigint").alias("k"),
            "cohort_size",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


@register(
    "q_graph_hits",
    oracle=f"""
        WITH edges AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem
        ),
        a1 AS (
            SELECT pk, CAST(COUNT(*) AS BIGINT) AS a FROM edges GROUP BY pk
        ),
        h1 AS (
            SELECT e.ok, CAST(SUM(a1.a) AS BIGINT) AS h
            FROM edges e JOIN a1 ON a1.pk = e.pk
            GROUP BY e.ok
        ),
        a2 AS (
            SELECT e.pk, CAST(SUM(h1.h) AS BIGINT) AS a
            FROM edges e JOIN h1 ON h1.ok = e.ok
            GROUP BY e.pk
        ),
        mx AS (SELECT MAX(a) AS m FROM a2)
        SELECT pk AS l_partkey, a AS authority_raw,
               ROUND(CAST(a AS DOUBLE) / m, 9) AS authority
        FROM a2 CROSS JOIN mx
        ORDER BY a DESC, pk ASC
        LIMIT {_HITS_TOP}
    """,
    doc=(
        "HITS hubs/authorities (Kleinberg 1999), two unrolled "
        "mutual-reinforcement iterations on the bipartite order-part "
        "graph: a1 = part degree, h1 = Σ a1 over an order's basket, "
        "a2 = Σ h1 over a part's orders — authority top-20. Parity: "
        "the un-normalized recursion is EXACT BIGINT (values bounded "
        "by degree·basket·degree, ~1e8 at sf0.1), one double division "
        "by the max at the end — per-iteration L2 normalization would "
        "put a sqrt inside the recursion, so normalization is ONCE at "
        "the end (same ranking, exact arithmetic). Scale: two "
        "edge-keyed groupBy joins on the session-cached edge table; "
        "top-k via TakeOrderedAndProject, no global sort."
    ),
    tags=("graph", "analytics"),
)
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import (
        order_part_edges_table,
    )

    edges = order_part_edges_table(spark, sf_dir).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    a1 = edges.groupBy("pk").agg(F.count("*").cast("bigint").alias("a"))
    h1 = (
        edges.join(a1, "pk")
        .groupBy("ok")
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    a2 = (
        edges.join(h1, "ok")
        .groupBy("pk")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    # snapshot the final authority table: the max-normalizer and the
    # output read it, otherwise both re-run the two HITS half-steps (r11)
    a2 = a2.transform(snapshot(eager=False))
    mx = a2.agg(F.max("a").alias("m"))
    return (
        a2.crossJoin(F.broadcast(mx))
        .select(
            F.col("pk").alias("l_partkey"),
            F.col("a").alias("authority_raw"),
            F.round(F.col("a").cast("double") / F.col("m"), 9).alias(
                "authority"
            ),
        )
        .orderBy(F.col("authority_raw").desc(), F.col("l_partkey").asc())
        .limit(_HITS_TOP)
    )
