"""Aggregation queries (SURVEY.md §2-C "Aggregation" block).

All hash aggregations: Catalyst plans partial (map-side) + final
aggregation around a single shuffle on the group keys — the shape that
scales linearly with data volume. No collect_list on unbounded groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_agg_groupby",
    oracle=f"""
        SELECT
            l_returnflag,
            l_linestatus,
            {dsum_sql('l_quantity', 'sum_qty')},
            {dsum_sql('l_extendedprice', 'sum_base_price')},
            {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
            {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
            {davg_sql('l_quantity', 'avg_qty')},
            {davg_sql('l_extendedprice', 'avg_price')},
            {davg_sql('l_discount', 'avg_disc')},
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary: filter → hash agg (sum/avg/count) by flag+status.",
    tags=("agg", "flagship"),
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    oracle="""
        SELECT
            o_orderpriority,
            COUNT(DISTINCT o_custkey) AS n_customers,
            CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_distinct_price,
            COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Distinct aggregates: count-distinct + sum-distinct alongside plain count.",
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum_distinct(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_distinct_price"),
        F.count("*").alias("n_orders"),
    )


@register(
    "q_agg_approx",
    oracle="""
        SELECT
            l_returnflag,
            COUNT(*) AS n_rows,
            COUNT(DISTINCT l_orderkey) AS exact_orders,
            TRUE AS within_5pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc=(
        "Approximate count-distinct (HyperLogLog++, rsd=0.01) run "
        "alongside the exact countDistinct; the hashed output carries "
        "the exact column plus a Spark-computed within_5pct bound flag "
        "(5 sigma at rsd=0.01), which the oracle replays as literal "
        "TRUE — the sketch executes in the plan but its estimate stays "
        "out of the hash-compared columns."
    ),
    tags=("agg", "approx"),
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.01).alias("est_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "exact_orders",
            (
                F.abs(F.col("est_orders") - F.col("exact_orders"))
                <= 0.05 * F.col("exact_orders")
            ).alias("within_5pct"),
        )
    )


@register(
    "q_agg_rollup_cube",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            GROUPING(l_returnflag, l_linestatus) AS gid,
            COUNT(*) AS n_rows,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP with grouping_id: hierarchical subtotals in one pass (expand + hash agg).",
    tags=("agg",),
)
def q_agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")


@register(
    "q_agg_having",
    oracle=f"""
        SELECT
            l_partkey,
            COUNT(*) AS n_lines,
            {dsum_sql('l_quantity', 'sum_qty')}
        FROM lineitem
        GROUP BY l_partkey
        HAVING COUNT(*) >= 3 AND SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50
    """,
    doc="Post-aggregation filter (HAVING).",
    tags=("agg",),
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_lines"),
            dsum("l_quantity", "sum_qty"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_exact_sum"),
        )
        .filter((F.col("n_lines") >= 3) & (F.col("_exact_sum") > 50))
        .drop("_exact_sum")
    )


@register(
    "q_agg_stats",
    oracle="""
        SELECT
            l_returnflag,
            ROUND((CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
            / (COUNT(*) - 1), 3) AS price_var,
            ROUND(SQRT(
                (CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)
            ), 6) AS price_stddev,
            MIN(l_extendedprice) AS price_min,
            MAX(l_extendedprice) AS price_max,
            COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc=(
        "Statistical aggregates: sample variance/stddev via exact decimal "
        "moment sums (order-independent, oracle-exact), plus min/max. "
        "Native stddev_samp is covered with float tolerance in unit tests."
    ),
    tags=("agg", "stats"),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("decimal(12,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(x * x).cast("double").alias("_sx2"),
        F.sum(x).cast("double").alias("_sx"),
        F.count("*").alias("n_rows"),
        F.min("l_extendedprice").alias("price_min"),
        F.max("l_extendedprice").alias("price_max"),
    )
    var = (F.col("_sx2") - F.col("_sx") * F.col("_sx") / F.col("n_rows")) / (
        F.col("n_rows") - 1
    )
    return agg.select(
        "l_returnflag",
        F.round(var, 3).alias("price_var"),
        F.round(F.sqrt(var), 6).alias("price_stddev"),
        "price_min",
        "price_max",
        "n_rows",
    )


@register(
    "q_agg_histogram",
    oracle="""
        -- width_bucket(x, 0, 500000, 20) spelled arithmetically
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) + 1 AS bucket,
               COUNT(*) AS n,
               CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi
        FROM orders
        GROUP BY 1
    """,
    doc=(
        "Value histogram via width_bucket: 20 equal bins over the price "
        "domain — one hash aggregate, the building block of numeric "
        "profiling over a 100 TB column."
    ),
    tags=("agg", "histogram"),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(20)).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@register(
    "q_agg_corr",
    oracle="""
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_on_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc=(
        "Bivariate statistics: Pearson correlation, sample covariance "
        "and regression slope per group, rounded to fixed precision "
        "(both engines use one-pass co-moment updates whose float "
        "ordering differs in the last ulps)."
    ),
    tags=("agg", "stats"),
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope_price_on_qty"),
    )


@register(
    "q_agg_mode_deterministic",
    oracle="""
        SELECT user_id, event_type AS mode_event, n FROM (
            SELECT user_id, event_type, n,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY n DESC, event_type ASC
                   ) AS rn
            FROM (
                SELECT user_id, event_type, COUNT(*) AS n
                FROM events GROUP BY 1, 2
            )
        ) WHERE rn = 1
    """,
    doc=(
        "Deterministic mode (most frequent event_type per user): "
        "count-then-argmax with an explicit alphabetical tiebreak — "
        "never the builtin mode(), whose tie behavior is "
        "engine-dependent."
    ),
    tags=("agg", "mode"),
)
def q_agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), "n")
    )


@register(
    "q_agg_bitwise",
    oracle="""
        SELECT event_type,
               bit_and(k) AS k_and,
               bit_or(k)  AS k_or,
               bit_xor(k) AS k_xor,
               COUNT(k) AS n
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        WHERE k IS NOT NULL
        GROUP BY event_type
    """,
    doc=(
        "Bitwise AND/OR/XOR aggregates over the JSON 'k' property per "
        "event type — integer-exact on both engines, map-side "
        "combinable (all three are commutative/associative)."
    ),
    tags=("aggregate", "bitwise"),
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.bit_and("k").alias("k_and"),
            F.bit_or("k").alias("k_or"),
            F.bit_xor("k").alias("k_xor"),
            F.count("k").alias("n"),
        )
    )


@register(
    "q_agg_hll_mergeable",
    oracle="""
        SELECT
            event_type,
            COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
            COUNT(DISTINCT user_id) AS exact_users,
            TRUE AS within_5pct
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "Mergeable HyperLogLog rollup — the continuous-aggregate scale "
        "pattern: per-(event_type, day) HLL sketches of the user set "
        "(the only state a daily rollup job persists), merged upward "
        "with hll_union_agg for the per-type total, next to the exact "
        "countDistinct for error accounting. The sketch table is "
        "O(groups x sketch_size) and re-mergeable to any coarser "
        "grain without touching raw data — countDistinct is not. "
        "Oracle-checked via the bounds pattern: hashed columns are the "
        "exact user counts plus a Spark-computed within_5pct flag the "
        "oracle replays as TRUE; the HLL union/estimate executes in "
        "the plan but its estimate stays out of the hashed columns. "
        "Re-merge determinism is asserted in tests/test_operators.py."
    ),
    tags=("aggregate", "sketch", "rollup"),
)
def q_agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_daily"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
            F.count("*").alias("n_days"),
        )
        .join(
            e.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users")),
            "event_type",
        )
        .select(
            "event_type",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
    )


@register(
    "q_agg_tdigest_mergeable",
    oracle="""
        WITH ex AS (
            SELECT
                event_type,
                COUNT(DISTINCT CAST(ts AS DATE)) AS n_subs,
                quantile_cont(value, 0.5) AS p50,
                quantile_cont(value, 0.9) AS p90,
                quantile_cont(value, 0.99) AS p99
            FROM events
            GROUP BY event_type
        )
        SELECT
            e.event_type,
            e.n_subs,
            qv.q,
            CAST(CAST(ROUND(
                CASE qv.q WHEN 0.5 THEN e.p50 WHEN 0.9 THEN e.p90 ELSE e.p99 END,
                6) AS DECIMAL(18,6)) AS DOUBLE) AS exact_v,
            TRUE AS within_2pct_rank
        FROM ex e CROSS JOIN (VALUES (0.5), (0.9), (0.99)) AS qv(q)
    """,
    doc=(
        "Mergeable t-digest quantile rollup (operators/tdigest, k1 "
        "scale function, delta=200) — the quantile sibling of "
        "q_agg_hll_mergeable: per-(event_type, day) partial digests of "
        "the value column are the only persisted state, re-merged per "
        "event_type and interrogated for p50/p90/p99. Oracle-checked "
        "via the bounds pattern: hashed columns are the exact "
        "percentiles (DECIMAL-quantized; DuckDB quantile_cont twin) "
        "plus the Spark-computed within_2pct_rank flag — the achieved "
        "rank of the sketch estimate (fraction of values <= estimate, "
        "broadcast join) must sit within 2% of the target rank, which "
        "the oracle replays as literal TRUE. The digest itself "
        "executes in the plan; its estimates stay out of the hashed "
        "columns. Determinism and mergeability are pinned in "
        "tests/test_tdigest.py."
    ),
    tags=("aggregate", "sketch", "rollup", "pandas-udf"),
)
def q_agg_tdigest_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.tdigest import tdigest_quantiles

    e = load(spark, sf_dir, "events")
    qs = (0.5, 0.9, 0.99)
    est = tdigest_quantiles(
        e, "event_type", F.to_date("ts"), "value", qs=qs
    ).withColumnRenamed("group", "event_type")
    exact = (
        e.groupBy("event_type")
        .agg(F.percentile("value", F.lit(list(qs))).alias("ex"))
        .select(
            "event_type",
            F.explode(F.arrays_zip(F.lit(list(qs)).alias("q"), F.col("ex").alias("exact_v"))).alias("z"),
        )
        .select("event_type", F.col("z.q").alias("q"), F.col("z.exact_v").alias("exact_v"))
    )
    joined = est.join(exact, ["event_type", "q"])
    achieved = (
        e.join(F.broadcast(joined), "event_type")
        .groupBy("event_type", "q", "n_subs", "est", "exact_v")
        .agg(F.avg((F.col("value") <= F.col("est")).cast("double")).alias("achieved_q"))
    )
    return achieved.select(
        "event_type",
        "n_subs",
        "q",
        # round-then-cast (the quantize_embeddings-measured-safe pattern):
        # a direct double->decimal cast can disagree across engines in
        # the final bit; rounding first snaps both sides to one grid.
        F.round(F.col("exact_v"), 6).cast("decimal(18,6)").cast("double").alias("exact_v"),
        (F.abs(F.col("achieved_q") - F.col("q")) <= 0.02).alias("within_2pct_rank"),
    )
