"""Sort / limit / set-operation queries (SURVEY.md §2-C block).

Limit-with-order compiles to TakeOrderedAndProject (per-partition top-k
+ driver merge — no global sort materialization); set ops hash-shuffle
on the full row. Deterministic tiebreakers everywhere a LIMIT or a
representative-row choice could otherwise be ambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_sort_multi",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal, c_nationkey
        FROM customer
        ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
    """,
    doc="Multi-key sort asc/desc with explicit null ordering (hash check is order-insensitive; ordering itself asserted in unit tests).",
    tags=("sort",),
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal", "c_nationkey").orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    )


@register(
    "q_limit_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 25
    """,
    doc="Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject (no full sort).",
    tags=("sort", "topk"),
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@register(
    "q_union_except_intersect",
    oracle="""
        WITH open_cust AS (
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ),
        done_cust AS (
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT 'union' AS op, o_custkey FROM (SELECT o_custkey FROM open_cust UNION SELECT o_custkey FROM done_cust)
        UNION ALL
        SELECT 'except' AS op, o_custkey FROM (SELECT o_custkey FROM open_cust EXCEPT SELECT o_custkey FROM done_cust)
        UNION ALL
        SELECT 'intersect' AS op, o_custkey FROM (SELECT o_custkey FROM open_cust INTERSECT SELECT o_custkey FROM done_cust)
    """,
    doc="UNION (distinct), EXCEPT, INTERSECT over customer-key sets, labeled and unioned-all together.",
    tags=("setop",),
)
def q_union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return (
        open_c.union(done_c).distinct().select(F.lit("union").alias("op"), "o_custkey")
        .unionByName(open_c.exceptAll(done_c).select(F.lit("except").alias("op"), "o_custkey"))
        .unionByName(open_c.intersect(done_c).select(F.lit("intersect").alias("op"), "o_custkey"))
    )


@register(
    "q_distinct_dedup_exact",
    oracle="""
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity
        FROM (
            SELECT
                l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                ROW_NUMBER() OVER (
                    PARTITION BY l_partkey, l_suppkey
                    ORDER BY l_orderkey ASC, l_linenumber ASC
                ) AS rn
            FROM lineitem
        )
        WHERE rn = 1
    """,
    doc=(
        "Exact dedup with deterministic representative: keep first row per "
        "(partkey, suppkey) by (orderkey, linenumber). dropDuplicates picks "
        "an arbitrary row, so the engine dedup primitive is the ranked-window "
        "form — reproducible and oracle-checkable."
    ),
    tags=("dedup",),
)
def q_distinct_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey", "l_suppkey").orderBy(
        F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
    )
