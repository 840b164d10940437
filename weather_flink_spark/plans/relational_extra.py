"""Relational coverage extensions: pivot, subqueries, null handling,
grouping sets, and the partitioned sink round-trip.

Fills the §2-C gaps a user of a full engine expects beyond the core
blocks: reshaping (pivot/unpivot), scalar + correlated subqueries
(Catalyst decorrelates them to joins), null-handling functions, SQL
GROUPING SETS (beyond rollup/cube), and a write path: partitioned
parquet out, partition-pruned scan back.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.functions.numeric import dsum, dsum_sql
from weather_flink_spark.io import load
from weather_flink_spark.operators.global_order import attach_exclusive_prefix_max
from weather_flink_spark.plans.registry import register

PIVOT_FLAGS = ("A", "N", "R")


@register(
    "q_pivot",
    oracle=f"""
        SELECT l_linestatus,
            {", ".join(
                f"CAST(SUM(CASE WHEN l_returnflag = '{f}'"
                f" THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_{f}"
                for f in PIVOT_FLAGS
            )}
        FROM lineitem
        GROUP BY l_linestatus
    """,
    doc=(
        "Pivot: returnflag values become columns (sum of quantity per "
        "linestatus × flag). Spark plans it as a single hash aggregate "
        "with conditional partials — one pass, no per-column scans."
    ),
    tags=("reshape",),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", list(PIVOT_FLAGS))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"))
    )
    renames = [F.col("l_linestatus")] + [F.col(f).alias(f"qty_{f}") for f in PIVOT_FLAGS]
    return out.select(*renames)


@register(
    "q_unpivot",
    oracle="""
        SELECT o_orderkey, metric, value FROM (
            SELECT o_orderkey,
                   UNNEST(['totalprice', 'custkey']) AS metric,
                   UNNEST([CAST(o_totalprice AS DOUBLE), CAST(o_custkey AS DOUBLE)]) AS value
            FROM orders
        )
        WHERE o_orderkey < 1000
    """,
    doc="Unpivot/melt: wide columns to (metric, value) rows via stack().",
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', cast(o_totalprice as double),"
            " 'custkey', cast(o_custkey as double))"
        ).alias("metric", "value"),
    )


@register(
    "q_subquery_scalar",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT AVG(o_totalprice) FROM orders) AS delta_from_avg
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
    doc=(
        "Scalar subquery: orders above the global average price, with "
        "the delta. Catalyst evaluates the subquery once (ReusedSubquery) "
        "and broadcasts the scalar — no join, no per-row re-aggregation."
    ),
    tags=("subquery",),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT AVG(o_totalprice) FROM orders_v) AS delta_from_avg
        FROM orders_v
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders_v)
        """
    )


@register(
    "q_subquery_correlated",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT AVG(o_totalprice) / 100 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    """,
    doc=(
        "Correlated scalar subquery: customers whose balance exceeds 1% "
        "of their own average order price. Catalyst decorrelates to an "
        "aggregate + join — the per-row subquery never executes per row."
    ),
    tags=("subquery",),
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sub_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer_v c
        WHERE c_acctbal > (
            SELECT AVG(o_totalprice) / 100 FROM orders_sub_v o WHERE o.o_custkey = c.c_custkey
        )
        """
    )


@register(
    "q_null_funcs",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS status_nulled,
               COALESCE(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END,
                        '<open>') AS status_or_default,
               (CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END)
                   IS NOT DISTINCT FROM 'F' AS is_f_nullsafe,
               IFNULL(NULLIF(o_orderpriority, '1-URGENT'), 'urgent!') AS priority_mapped
        FROM orders
        WHERE o_orderkey < 2000
    """,
    doc="Null handling: coalesce, nullif, ifnull, null-safe equality (<=>).",
    tags=("scalar",),
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    status_nulled = F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("string")).otherwise(
        F.col("o_orderstatus")
    )
    return o.select(
        "o_orderkey",
        status_nulled.alias("status_nulled"),
        F.coalesce(status_nulled, F.lit("<open>")).alias("status_or_default"),
        status_nulled.eqNullSafe("F").alias("is_f_nullsafe"),
        F.ifnull(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("urgent!")).alias(
            "priority_mapped"
        ),
    )


@register(
    "q_agg_grouping_sets",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql("l_quantity", "sum_qty")},
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS (beyond rollup/cube): three chosen grouping levels in one pass.",
    tags=("agg",),
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem_gs_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "q_sink_partitioned_roundtrip",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    doc=(
        "The write path: orders written as parquet partitioned by "
        "o_orderstatus, read back with a partition filter — the scan "
        "lists ONLY the o_orderstatus=F directory (partition pruning), "
        "then aggregates. At 100 TB, partitioned layout + pruning is "
        "the storage half of every query's performance."
    ),
    tags=("sink", "partitioning"),
)
def q_sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_dir = os.path.join(
        tempfile.gettempdir(), f"wfs_sink_rt_{os.getpid()}_{abs(hash(sf_dir)) % 10_000}"
    )
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    (
        load(spark, sf_dir, "orders")
        .write.partitionBy("o_orderstatus")
        .mode("overwrite")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir).filter(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice", "sum_price")
    )


@register(
    "q_explode_lateral",
    oracle="""
        SELECT vec_id, pos, CAST(component AS DOUBLE) AS component
        FROM (
            SELECT vec_id,
                   UNNEST(range(1, len(embedding) + 1)) - 1 AS pos,
                   UNNEST(embedding) AS component
            FROM embeddings
        )
        WHERE vec_id < 20 AND pos < 8
    """,
    doc=(
        "Lateral fan-out: posexplode of the embedding array to "
        "(vec_id, pos, component) rows — the UDTF-shaped operator as a "
        "built-in generator (no Python)."
    ),
    tags=("reshape", "array"),
)
def q_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "component")
    ).filter(F.col("pos") < 8).withColumn("component", F.col("component").cast("double"))


@register(
    "q_map_funcs",
    oracle="""
        SELECT event_id,
               CAST(len(json_keys(props)) AS INT) AS n_keys,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
               json_extract_string(props, '$.k') AS k_value,
               COALESCE(json_extract_string(props, '$.missing'), '<absent>') AS missing_value
        FROM events
        WHERE event_id < 2000
    """,
    doc=(
        "Map-typed column functions: JSON props parsed to map<string,string>, "
        "then map_keys (sorted for determinism), element_at lookup, and "
        "missing-key handling — the MapType member of the scalar family."
    ),
    tags=("scalar", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").alias("k_value"),
        F.coalesce(F.element_at(m, "missing"), F.lit("<absent>")).alias("missing_value"),
    )


@register(
    "q_win_range_frame",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
               ) AS DOUBLE) AS near_price_sum,
               COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
               ) AS near_price_n
        FROM orders
        WHERE o_orderkey < 5000
    """,
    doc=(
        "RANGE window frames (value-based, vs the ROWS frames in "
        "q_win_frame_running): for each order, the sum/count of the "
        "same customer's orders within ±1000 of its price."
    ),
    tags=("window",),
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PySpark's Window.rangeBetween only accepts integer offsets; the
    # SQL window syntax supports value-typed (here double) frame bounds
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    frame = (
        "over (partition by o_custkey order by o_totalprice "
        "range between 1000.0 preceding and 1000.0 following)"
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.expr(
            f"cast(sum(cast(o_totalprice as decimal(18,6))) {frame} as double)"
        ).alias("near_price_sum"),
        F.expr(f"count(*) {frame}").alias("near_price_n"),
    )


@register(
    "q_skyline_pareto",
    oracle="""
        WITH per_price AS (
            SELECT p_retailprice, MAX(p_size) AS pmax
            FROM part GROUP BY p_retailprice
        ),
        fronts AS (
            SELECT p_retailprice, pmax,
                   MAX(pmax) OVER (
                       ORDER BY p_retailprice ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS max_size_cheaper
            FROM per_price
        )
        SELECT p.p_partkey, p.p_retailprice, p.p_size
        FROM part p JOIN fronts f ON p.p_retailprice = f.p_retailprice
        WHERE NOT (COALESCE(f.max_size_cheaper >= p.p_size, FALSE)
                   OR f.pmax > p.p_size)
    """,
    doc=(
        "2-D Pareto skyline (minimize price, maximize size): a part is "
        "on the frontier iff no part is both <= in price and >= in size "
        "with one strict. Instead of the naive quadratic dominance "
        "self-join, the plan reduces to per-price maxima + one running "
        "max over the price-sorted fronts (O(n log n), a single window "
        "pass over the distinct-price table) — a dominance test point i "
        "only needs max(size) over strictly-cheaper prices and the max "
        "at its own price. Survives scale-up: the per-price table is "
        "the only shuffled state, and the running max is the two-pass "
        "range-partitioned prefix max of operators.global_order — no "
        "partitionless WindowExec even when |distinct prices| explodes."
    ),
    tags=("analytics", "skyline"),
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("pmax"))
    fronts = attach_exclusive_prefix_max(
        per_price, [F.col("p_retailprice").asc()], "pmax", "max_size_cheaper"
    )
    dominated = F.coalesce(
        F.col("max_size_cheaper") >= F.col("p_size"), F.lit(False)
    ) | (F.col("pmax") > F.col("p_size"))
    return (
        p.join(fronts, "p_retailprice")
        .filter(~dominated)
        .select("p_partkey", "p_retailprice", "p_size")
    )
