"""Join queries (SURVEY.md §2-C "Joins" block).

Scale posture: dimension tables (region/nation/supplier/part at TPC-H
ratios) are broadcast — no shuffle of the fact table for star joins.
Fact-fact joins (lineitem ⋈ orders) shuffle on the join key and lean on
AQE for skew splitting. The as-of join avoids an O(n²) theta join by
bucketing on the equality key and window-ranking — the standard
scalable as-of pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.functions.numeric import dsum, dsum_sql
from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_join_inner_equi",
    oracle=f"""
        SELECT
            o.o_orderpriority,
            COUNT(*) AS n_lines,
            {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY o.o_orderpriority
    """,
    doc="Fact-fact inner equi-join (lineitem ⋈ orders) + aggregation; shuffle join, AQE-managed.",
    tags=("join",),
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "q_join_broadcast",
    oracle="""
        SELECT
            n.n_name,
            r.r_name,
            COUNT(*) AS n_customers,
            CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name
    """,
    doc="Star join with explicitly broadcast dims (nation, region) — zero fact-side shuffle for the join.",
    tags=("join", "broadcast"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal", "sum_acctbal"),
        )
    )


@register(
    "q_join_left_right_full",
    oracle="""
        SELECT
            c.c_custkey,
            c.c_name,
            o.o_orderkey,
            o.o_totalprice
        FROM customer c
        FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 3000.0) o
          ON c.c_custkey = o.o_custkey
    """,
    doc="Outer join family; full-outer shown (left/right covered by unit tests on the same helper).",
    tags=("join", "outer"),
)
def q_join_left_right_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 3000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_semi_anti",
    oracle="""
        SELECT
            c.c_custkey,
            c.c_mktsegment,
            (c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS has_open_order
        FROM customer c
        WHERE c.c_custkey IN (SELECT o_custkey FROM orders)
    """,
    doc="Existence joins: left-semi (customers with orders) + marker derived via second semi.",
    tags=("join", "semi"),
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    open_orders = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    with_orders = c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_semi")
    return (
        with_orders.join(
            open_orders.withColumnRenamed("o_custkey", "_ok"),
            with_orders.c_custkey == F.col("_ok"),
            "left",
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("_ok").isNotNull().alias("has_open_order"),
        )
    )


@register(
    "q_join_anti",
    oracle="""
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM customer c
        WHERE c.c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1997-04-01'
        )
    """,
    doc=(
        "Left-anti join: customers with no orders in 1997Q1 (NOT EXISTS "
        "against a date-restricted subquery). The quarter restriction "
        "keeps the result non-empty at every SF — the unrestricted "
        "variant returns 0 rows (every customer has some order), which "
        "made the oracle comparison vacuous."
    ),
    tags=("join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_theta_range",
    oracle="""
        SELECT
            p.p_partkey,
            p.p_size,
            COUNT(*) AS n_suppliers_in_band
        FROM part p
        JOIN supplier s
          ON s.s_acctbal >= p.p_size * 100.0 AND s.s_acctbal < (p.p_size + 20) * 100.0
        GROUP BY p.p_partkey, p.p_size
    """,
    doc="Non-equi range (theta) join: broadcast nested-loop over the small side, then agg.",
    tags=("join", "range"),
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    cond = (s.s_acctbal >= p.p_size * 100.0) & (s.s_acctbal < (p.p_size + 20) * 100.0)
    return (
        p.join(F.broadcast(s), cond)
        .groupBy("p_partkey", "p_size")
        .agg(F.count("*").alias("n_suppliers_in_band"))
    )


@register(
    "q_join_multiway_star",
    oracle=f"""
        SELECT
            n.n_name,
            {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
            COUNT(*) AS n_lines
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation n    ON s.s_nationkey = n.n_nationkey
        JOIN region r    ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5-shaped 6-way star join: fact-fact shuffle + broadcast dims, revenue by nation.",
    tags=("join", "star"),
)
def q_join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_join_asof",
    oracle="""
        SELECT
            e.event_id,
            e.user_id,
            e.ts,
            o.o_orderkey AS last_order_key,
            o.o_orderdate AS last_order_date,
            o.o_totalprice AS last_order_price
        FROM events e
        LEFT JOIN LATERAL (
            SELECT od.o_orderkey, od.o_orderdate, od.o_totalprice
            FROM orders od
            WHERE od.o_custkey % 15 = e.user_id AND od.o_orderdate <= e.ts
            ORDER BY od.o_orderdate DESC, od.o_orderkey DESC
            LIMIT 1
        ) o ON TRUE
    """,
    doc=(
        "As-of join: most recent order at-or-before each event, per user. "
        "Implemented scalably as union + partition-window backfill (no "
        "O(n²) theta join): tag both sides, sort within user partition, "
        "last(ignore nulls) carries the latest order forward. One shuffle "
        "on user_id + one sort — sort-merge shape, unlike a range theta "
        "join which degenerates to a nested loop."
    ),
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn("user_id", F.col("o_custkey") % 15)
    e = load(spark, sf_dir, "events")

    probe = e.select(
        "user_id",
        F.col("ts").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_o_key"),
        "event_id",
        "ts",
        F.lit(None).cast("timestamp").alias("_o_date"),
        F.lit(None).cast("double").alias("_o_price"),
    )
    build = o.select(
        "user_id",
        F.col("o_orderdate").alias("_t"),
        F.lit(0).alias("_side"),
        F.col("o_orderkey").alias("_o_key"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("o_orderdate").alias("_o_date"),
        F.col("o_totalprice").alias("_o_price"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_o_key").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        probe.unionByName(build)
        .withColumn("last_order_key", F.last("_o_key", ignorenulls=True).over(w))
        .withColumn("last_order_date", F.last("_o_date", ignorenulls=True).over(w))
        .withColumn("last_order_price", F.last("_o_price", ignorenulls=True).over(w))
    )
    return joined.filter(F.col("_side") == 1).select(
        "event_id", "user_id", "ts", "last_order_key", "last_order_date", "last_order_price"
    )


@register(
    "q_integrity_audit",
    oracle="""
        SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans
        FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'orders->customer', COUNT(*)
        FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'customer->nation', COUNT(*)
        FROM customer c ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc=(
        "Referential-integrity audit: orphaned foreign keys counted per "
        "relationship via anti joins (broadcast for the dim sides) — "
        "the data-quality gate run before any pipeline consumes a drop."
    ),
    tags=("join", "audit"),
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    def orphans(fact, dim, fk, pk, label):
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, o, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionByName(orphans(o, c, "o_custkey", "c_custkey", "orders->customer"))
        .unionByName(orphans(c, F.broadcast(n), "c_nationkey", "n_nationkey", "customer->nation"))
    )


@register(
    "q_join_asof_forward",
    oracle="""
        SELECT
            e.event_id,
            e.user_id,
            e.ts,
            o.o_orderkey AS next_order_key,
            o.o_orderdate AS next_order_date,
            o.o_totalprice AS next_order_price
        FROM events e
        LEFT JOIN LATERAL (
            SELECT od.o_orderkey, od.o_orderdate, od.o_totalprice
            FROM orders od
            WHERE od.o_custkey % 15 = e.user_id AND od.o_orderdate >= e.ts
            ORDER BY od.o_orderdate ASC, od.o_orderkey ASC
            LIMIT 1
        ) o ON TRUE
    """,
    doc=(
        "Forward as-of join: earliest order at-or-after each event, per "
        "user — the symmetric twin of q_join_asof, same union + "
        "partition-window shape but with a following frame and "
        "first(ignore nulls). Probe rows sort before build rows on "
        "timestamp ties so an order at exactly the event time is "
        "matched (at-or-after inclusive). One shuffle + one sort."
    ),
    tags=("join", "asof"),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn("user_id", F.col("o_custkey") % 15)
    e = load(spark, sf_dir, "events")

    probe = e.select(
        "user_id",
        F.col("ts").alias("_t"),
        F.lit(0).alias("_side"),  # probe first on ties -> inclusive match
        F.lit(None).cast("long").alias("_o_key"),
        "event_id",
        "ts",
        F.lit(None).cast("timestamp").alias("_o_date"),
        F.lit(None).cast("double").alias("_o_price"),
    )
    build = o.select(
        "user_id",
        F.col("o_orderdate").alias("_t"),
        F.lit(1).alias("_side"),
        F.col("o_orderkey").alias("_o_key"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("o_orderdate").alias("_o_date"),
        F.col("o_totalprice").alias("_o_price"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_o_key").asc_nulls_last())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    joined = (
        probe.unionByName(build)
        .withColumn("next_order_key", F.first("_o_key", ignorenulls=True).over(w))
        .withColumn("next_order_date", F.first("_o_date", ignorenulls=True).over(w))
        .withColumn("next_order_price", F.first("_o_price", ignorenulls=True).over(w))
    )
    return joined.filter(F.col("_side") == 0).select(
        "event_id", "user_id", "ts", "next_order_key", "next_order_date", "next_order_price"
    )


@register(
    "q_join_null_safe",
    oracle="""
        WITH a AS (
            SELECT n_nationkey, n_name,
                   CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS k
            FROM nation
        ),
        b AS (
            SELECT r_regionkey, r_name,
                   CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END AS k
            FROM region
        )
        SELECT a.n_nationkey, a.n_name, b.r_name,
               (a.k IS NULL) AS matched_on_null
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    doc=(
        "Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
        "keys match each other instead of vanishing — the semantics a "
        "changelog join needs when the key itself can be legitimately "
        "absent. Both sides null out region 0 to prove the NULL=NULL "
        "match path alongside ordinary matches."
    ),
    tags=("join", "nulls"),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    a = n.select(
        "n_nationkey",
        "n_name",
        F.when(F.col("n_regionkey") == 0, None).otherwise(F.col("n_regionkey")).alias("k"),
    )
    b = r.select(
        "r_regionkey",
        "r_name",
        F.when(F.col("r_regionkey") == 0, None).otherwise(F.col("r_regionkey")).alias("k"),
    )
    return (
        a.join(F.broadcast(b), a["k"].eqNullSafe(b["k"]))
        .select(
            "n_nationkey",
            "n_name",
            "r_name",
            a["k"].isNull().alias("matched_on_null"),
        )
    )
