"""Wave-4 analytics operators: information-theoretic profiling, Pareto
cumulative-share classification, independence testing, marketing
attribution, graph motif counting, weighted order statistics, and a
second SQL-entry TPC-H query.

All declarative DataFrame plans (no UDFs, no driver loops).  Float
parity with the DuckDB oracle follows the repo-wide discipline:
integer/DECIMAL-exact partials surfaced as DOUBLE with one rounding,
identical scalar expression shapes on both sides, and any multi-term
double summation done as a fixed-order fold (Spark ``aggregate()`` ==
DuckDB ``list_reduce``) so partition order can never reorder float
adds.

Scale notes (100 TB):
- entropy / chi-square reduce to one small-cardinality groupBy each
  (|event_type| x 24 or x 2 cells); partial aggregation does the heavy
  lifting map-side and the cell tables are broadcast-sized.
- the ABC cumulative share replaces the classic single-partition global
  window with a two-pass range-partitioned prefix sum: per-partition
  window + broadcast per-partition offsets — the global-order prefix
  without a global-order bottleneck.
- attribution shuffles once on user_id and runs as a running-frame MAX
  inside that sort (the backward as-of pattern).
- triangle counting bounds the candidate space by basket size (pairs
  per order ~ |basket|^2, not |table|^2) and a support>=2 filter before
  the cubic step; the surviving edge list is broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.operators.global_order import attach_global_row_number
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

LN2 = 0.6931471805599453  # same literal in both engines; never ln(2) at runtime

# ---------------------------------------------------------------------------
# Shannon entropy of the hour-of-day profile per event type
# ---------------------------------------------------------------------------


@register(
    "q_agg_entropy",
    oracle=f"""
        WITH cells AS (
            SELECT event_type,
                   CAST(epoch_us(ts) // 3600000000 % 24 AS INTEGER) AS hr,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ),
        folded AS (
            SELECT event_type,
                   CAST(SUM(c) AS BIGINT) AS n,
                   COUNT(*) AS n_hours,
                   LIST(CAST(c AS DOUBLE) ORDER BY hr ASC) AS cs
            FROM cells GROUP BY event_type
        )
        SELECT event_type, n, n_hours,
               ROUND((LN(CAST(n AS DOUBLE))
                      - list_reduce(list_prepend(0.0, cs),
                                    (acc, x) -> acc + x * LN(x)) / CAST(n AS DOUBLE))
                     / {LN2!r}, 6) AS entropy_bits
        FROM folded
    """,
    doc=(
        "Shannon entropy (bits) of each event type's hour-of-day "
        "histogram — the diurnal-concentration signal (uniform = "
        "log2(24) ~ 4.585 bits; bursty types score lower). H = (ln n - "
        "(1/n) SUM c*ln c)/ln 2, so only counts are aggregated "
        "(integer-exact, partial-aggregable); the 24 c*ln(c) terms are "
        "folded in fixed hour order on both engines, and ln 2 is a "
        "shared literal, never a runtime log. Hour-of-day comes from "
        "integer epoch arithmetic (epoch_us div 3600e6 mod 24), not "
        "engine EXTRACT, so timezone rules can't diverge."
    ),
    tags=("aggregate", "statistics", "text-analysis"),
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hr = F.expr("(unix_micros(ts) div 3600000000) % 24")
    cells = e.groupBy("event_type", hr.cast("int").alias("hr")).agg(F.count("*").alias("c"))
    folded = cells.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_hours"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("hr", "c"))), lambda x: x["c"].cast("double")
        ).alias("cs"),
    )
    nd = F.col("n").cast("double")
    s = F.aggregate(F.col("cs"), F.lit(0.0), lambda acc, x: acc + x * F.log(x))
    return folded.select(
        "event_type",
        "n",
        "n_hours",
        F.round((F.log(nd) - s / nd) / F.lit(LN2), 6).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# Pareto / ABC classification via two-pass distributed prefix sum
# ---------------------------------------------------------------------------

_ABC_ORACLE = """
    WITH rev AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, rev,
               SUM(rev) OVER (ORDER BY rev DESC, o_custkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum,
               (SELECT SUM(rev) FROM rev) AS tot
        FROM rev
    ),
    classed AS (
        SELECT o_custkey, rev,
               CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8 THEN 'A'
                    WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT abc_class, COUNT(*) AS n_customers,
           CAST(SUM(rev) AS DOUBLE) AS class_revenue,
           ROUND(CAST(SUM(rev) AS DOUBLE)
                 / CAST((SELECT SUM(rev) FROM rev) AS DOUBLE), 6) AS revenue_share
    FROM classed GROUP BY abc_class
"""


@register(
    "q_orders_abc_pareto",
    oracle=_ABC_ORACLE,
    doc=(
        "ABC / Pareto classification of customers by revenue: class A "
        "holds the first 80% of cumulative revenue (descending), B to "
        "95%, C the tail. The textbook form is a single-partition "
        "global cumulative window; here the prefix sum is two-pass and "
        "stays distributed: repartitionByRange on (rev DESC, custkey) "
        "keeps the total order across partitions, each partition "
        "computes a local running sum, and the per-partition totals "
        "(one tiny row each) broadcast back as offsets — prefix sums "
        "are partition-boundary-invariant, so the result is identical "
        "to the global window the DuckDB oracle runs. Revenue partials "
        "are DECIMAL-exact; only the final share divides as DOUBLE."
    ),
    tags=("window", "aggregate", "scale"),
)
def q_orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev")
    )
    # pass 1: range-partition in the total order, local prefix inside each part
    parted = rev.repartitionByRange(8, F.col("rev").desc(), F.col("o_custkey").asc())
    wloc = (
        Window.partitionBy("pid")
        .orderBy(F.col("rev").desc(), F.col("o_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted.withColumn("pid", F.spark_partition_id()).withColumn(
        "loc_cum", F.sum("rev").over(wloc)
    )
    # pass 2: per-partition totals -> running offset (tiny: one row per partition)
    wpid = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        local.groupBy("pid")
        .agg(F.sum("rev").alias("part_tot"))
        .withColumn("offset", F.sum("part_tot").over(wpid) - F.col("part_tot"))
        .select("pid", "offset")
    )
    tot = rev.agg(F.sum("rev").alias("tot"))
    classed = (
        local.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(tot))
        .withColumn("cum", F.col("loc_cum") + F.col("offset"))
        .withColumn("share", F.col("cum").cast("double") / F.col("tot").cast("double"))
        .withColumn(
            "abc_class",
            F.when(F.col("share") <= 0.8, "A").when(F.col("share") <= 0.95, "B").otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("rev").alias("class_rev_dec"),
            F.first(F.col("tot")).alias("tot"),
        )
        .select(
            "abc_class",
            "n_customers",
            F.col("class_rev_dec").cast("double").alias("class_revenue"),
            F.round(
                F.col("class_rev_dec").cast("double") / F.col("tot").cast("double"), 6
            ).alias("revenue_share"),
        )
    )


# ---------------------------------------------------------------------------
# chi-square test of independence: event_type x weekend
# ---------------------------------------------------------------------------


@register(
    "q_stats_chisq",
    oracle="""
        WITH tagged AS (
            SELECT event_type,
                   CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6)
                        THEN 1 ELSE 0 END AS wknd
            FROM events
        ),
        o AS (SELECT event_type, wknd, COUNT(*) AS obs FROM tagged GROUP BY 1, 2),
        r AS (SELECT event_type, SUM(obs) AS rtot FROM o GROUP BY 1),
        c AS (SELECT wknd, SUM(obs) AS ctot FROM o GROUP BY 1),
        n AS (SELECT SUM(obs) AS ntot FROM o),
        terms AS (
            SELECT o.event_type, o.wknd,
                   CAST(CAST(o.obs * n.ntot - r.rtot * c.ctot AS HUGEINT)
                        * CAST(o.obs * n.ntot - r.rtot * c.ctot AS HUGEINT) AS DOUBLE)
                   / CAST(n.ntot * r.rtot * c.ctot AS DOUBLE) AS term
            FROM o JOIN r USING (event_type) JOIN c USING (wknd) CROSS JOIN n
        )
        SELECT (SELECT CAST(ntot AS BIGINT) FROM n) AS n,
               (SELECT (COUNT(DISTINCT event_type) - 1) FROM o) AS dof,
               ROUND(list_reduce(
                   list_prepend(0.0, (SELECT LIST(term ORDER BY event_type ASC, wknd ASC)
                                      FROM terms)),
                   (acc, x) -> acc + x), 6) AS chi2
    """,
    doc=(
        "Pearson chi-square test of independence between event_type and "
        "weekend-ness. Weekend from pure integer epoch-day arithmetic "
        "((day+4) % 7 in {0=Sun, 6=Sat}) — no engine dayofweek "
        "convention involved. Each cell's statistic uses the "
        "denominator-cleared form (obs*N - rtot*ctot)^2 / (N*rtot*ctot): "
        "the numerator multiplies in DECIMAL (exact at any event count, "
        "matching the oracle's HUGEINT — int64 would wrap near 3e9 rows), "
        "each side cast to DOUBLE with a single rounding, and "
        "the ~10 cell terms fold in fixed (event_type, wknd) order. "
        "One shuffle to the cell table; marginals join broadcast-sized."
    ),
    tags=("aggregate", "statistics"),
)
def q_stats_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    day_idx = F.expr("((unix_micros(ts) div 86400000000) + 4) % 7")
    wknd = F.when(day_idx.isin(0, 6), 1).otherwise(0)
    o = e.groupBy("event_type", wknd.alias("wknd")).agg(F.count("*").alias("obs"))
    r = o.groupBy("event_type").agg(F.sum("obs").alias("rtot"))
    c = o.groupBy("wknd").agg(F.sum("obs").alias("ctot"))
    n = o.agg(F.sum("obs").alias("ntot"), F.countDistinct("event_type").alias("ntypes"))
    # multiply in DECIMAL, not LONG: at ~3e9 events obs*ntot ≈ 9e18 silently
    # wraps int64, while the oracle's HUGEINT stays exact. decimal(20,0)
    # operands keep the products exact; the difference fits decimal(19,0)
    # (|num| <= max(obs*ntot, rtot*ctot) < 1e19) so num*num stays within
    # Spark's 38-digit cap.
    dec = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    num = (dec("obs") * dec("ntot") - dec("rtot") * dec("ctot")).cast("decimal(19,0)")
    terms = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "wknd")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "wknd",
            "ntot",
            "ntypes",
            ((num * num).cast("double")
             / (F.col("ntot").cast("double") * F.col("rtot") * F.col("ctot"))).alias("term"),
        )
    )
    folded = terms.groupBy("ntot", "ntypes").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("event_type", "wknd", "term"))),
            lambda x: x["term"],
        ).alias("ts_terms")
    )
    chi2 = F.aggregate(F.col("ts_terms"), F.lit(0.0), lambda acc, x: acc + x)
    return folded.select(
        F.col("ntot").alias("n"),
        (F.col("ntypes") - 1).cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# last-touch attribution (purchase -> latest prior click within 24 h)
# ---------------------------------------------------------------------------


@register(
    "q_events_attribution",
    oracle="""
        WITH touch AS (
            SELECT user_id, event_id, ts, event_type,
                   CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kindr,
                   CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        marked AS (
            SELECT user_id, event_id, ts, event_type,
                   MAX(click_us) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, kindr ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS last_click_us
            FROM touch
        ),
        purch AS (
            SELECT epoch_us(ts) - last_click_us AS lag_us
            FROM marked WHERE event_type = 'purchase'
        )
        SELECT COUNT(*) AS n_purchases,
               COUNT(*) FILTER (WHERE lag_us IS NOT NULL
                                  AND lag_us <= 86400000000) AS n_attributed,
               ROUND(CAST(SUM(CASE WHEN lag_us <= 86400000000 THEN lag_us END) AS DOUBLE)
                     / CAST(COUNT(*) FILTER (WHERE lag_us IS NOT NULL
                                               AND lag_us <= 86400000000) AS DOUBLE)
                     / 1000000.0, 6) AS avg_lag_s
        FROM purch
    """,
    doc=(
        "Last-touch marketing attribution: each purchase is credited to "
        "the same user's most recent click no more than 24 h earlier. "
        "The backward as-of resolves as a running-frame MAX over "
        "(ts, kind, event_id) order — clicks sort before a same-"
        "timestamp purchase, so an instantaneous click still attributes "
        "— one shuffle on user_id, no self-join. Lag sums are BIGINT "
        "microseconds (exact); only the final mean divides as DOUBLE."
    ),
    tags=("window", "timeseries", "join"),
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    kindr = F.when(F.col("event_type") == "click", 0).otherwise(1)
    click_us = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), kindr.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.withColumn("last_click_us", F.max(click_us).over(w))
    lag_us = F.unix_micros("ts") - F.col("last_click_us")
    purch = marked.filter(F.col("event_type") == "purchase").select(lag_us.alias("lag_us"))
    attributed = F.col("lag_us").isNotNull() & (F.col("lag_us") <= 86_400_000_000)
    n_att = F.count(F.when(attributed, 1))
    return purch.agg(
        F.count("*").alias("n_purchases"),
        n_att.alias("n_attributed"),
        F.round(
            F.sum(F.when(attributed, F.col("lag_us"))).cast("double")
            / n_att.cast("double")
            / 1_000_000.0,
            6,
        ).alias("avg_lag_s"),
    )


def order_part_edges_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached DISTINCT (l_orderkey, l_partkey) bipartite edge
    list — the base every co-occurrence graph query (triangles,
    Adamic-Adar, basket lift) self-joins. Materialized once per
    (session, sf) like the dedup signature tables: at 100 TB this is
    the persisted edge table a production graph pipeline writes before
    any pair mining, and locally it deletes a lineitem scan + distinct
    shuffle per consumer."""
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build() -> DataFrame:
        res = (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .dropDuplicates()
            .persist()
        )
        res.count()
        return res

    return _cached("order_part_edges", spark, sf_dir, build)


# ---------------------------------------------------------------------------
# triangle counting on the co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "q_graph_triangles",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS p1, b.l_partkey AS p2, a.l_orderkey
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        edges AS (
            SELECT p1, p2 FROM pairs GROUP BY p1, p2 HAVING COUNT(*) >= 2
        ),
        nodes AS (SELECT p1 AS p FROM edges UNION SELECT p2 FROM edges),
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM edges e1
            JOIN edges e2 ON e2.p1 = e1.p2
            JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
        )
        SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
               (SELECT COUNT(*) FROM edges) AS n_edges,
               (SELECT n_triangles FROM tri) AS n_triangles
    """,
    doc=(
        "Triangle counting on the co-purchase graph: parts are linked "
        "when they appear together in >= 2 orders. The candidate pair "
        "space is bounded by basket size (|basket|^2 per order, never "
        "|lineitem|^2), the support filter prunes the edge list to "
        "broadcast size before the cubic step, and the p1<p2 "
        "orientation makes each triangle count exactly once via the "
        "canonical a<b<c wedge-closing join. At 100 TB the same plan "
        "holds with a degree-ordered orientation (point high-degree "
        "nodes at low-degree ones) to bound wedge fan-out."
    ),
    tags=("graph", "join"),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = order_part_edges_table(spark, sf_dir)
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
    edges = pairs.groupBy("p1", "p2").agg(F.count("*").alias("s")).filter(F.col("s") >= 2)
    # snapshot instead of persist (r11): a per-call persist without
    # unpersist leaks cached plans for the session lifetime, but a
    # localCheckpoint is owned by this DataFrame and GC'd with it —
    # and edges is referenced 5x (e1/e2/e3 + nodes twice + the edge
    # count), which the before-plan paid as 46 exchanges / 25 scans
    edges = edges.select("p1", "p2").transform(snapshot(eager=False))
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(F.broadcast(e2), F.col("e2.p1") == F.col("e1.p2"))
        .join(
            F.broadcast(e3),
            (F.col("e3.p1") == F.col("e1.p1")) & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("p1").alias("p"))
        .union(edges.select(F.col("p2").alias("p")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return nodes.crossJoin(n_edges).crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


# ---------------------------------------------------------------------------
# weighted median (quantity-weighted extended price per return flag)
# ---------------------------------------------------------------------------


@register(
    "q_agg_weighted_median",
    oracle="""
        WITH byprice AS (
            SELECT l_returnflag, l_extendedprice AS price,
                   SUM(CAST(l_quantity AS DECIMAL(14,2))) AS wgt
            FROM lineitem GROUP BY 1, 2
        ),
        cum AS (
            SELECT l_returnflag, price, wgt,
                   SUM(wgt) OVER (PARTITION BY l_returnflag ORDER BY price ASC
                                  ROWS UNBOUNDED PRECEDING) AS cumw,
                   SUM(wgt) OVER (PARTITION BY l_returnflag) AS totw
            FROM byprice
        )
        SELECT l_returnflag,
               MIN(CASE WHEN 2 * cumw >= totw THEN price END) AS weighted_median,
               CAST(MIN(totw) AS DOUBLE) AS total_weight
        FROM cum GROUP BY l_returnflag
    """,
    doc=(
        "Quantity-weighted median of extended price per return flag "
        "(lower weighted median: smallest price whose cumulative weight "
        "reaches half the total). Prices pre-aggregate per (flag, "
        "price) so the window runs over the distinct-value table, not "
        "the fact table; weights accumulate as exact DECIMAL and the "
        "half-total test is the division-free 2*cum >= tot comparison, "
        "so no float enters the selection. One shuffle on the flag."
    ),
    tags=("aggregate", "window", "statistics"),
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    byprice = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(14,2)")).alias("wgt"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.col("price").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = byprice.withColumn("cumw", F.sum("wgt").over(wcum)).withColumn(
        "totw", F.sum("wgt").over(wall)
    )
    return cum.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("price"))).alias(
            "weighted_median"
        ),
        F.min("totw").cast("double").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 (returned-item reporting) through the SQL entry point
# ---------------------------------------------------------------------------

_Q10_TABLES = ("customer", "orders", "lineitem", "nation")
_Q10_BODY = """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,6)))) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name
    FROM {customer} c
    JOIN {orders} o ON c.c_custkey = o.o_custkey
    JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
    JOIN {nation} n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
"""


@register(
    "q_sql_tpch_q10",
    oracle=_Q10_BODY.format(**{t: t for t in _Q10_TABLES}),
    doc=(
        "TPC-H Q10 (returned-item reporting) through the SQL entry "
        "point: identical SQL text runs on Spark temp views and on the "
        "DuckDB oracle. A quarter-selective fact predicate plus the "
        "returnflag filter reach the scans as pushed filters; nation "
        "broadcasts; revenue is DECIMAL-exact with one cast to DOUBLE; "
        "the top-20 is deterministic via the custkey tie-break and "
        "plans as TakeOrderedAndProject (no global sort materialized)."
    ),
    tags=("sql", "join", "agg", "topk"),
)
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = {}
    for t in _Q10_TABLES:
        v = f"{t}_q10_v"
        load(spark, sf_dir, t).createOrReplaceTempView(v)
        views[t] = v
    return spark.sql(_Q10_BODY.format(**views))


# ---------------------------------------------------------------------------
# n-gram containment (sub-document / quotation detection)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.5


@register(
    "q_dedup_containment",
    oracle="""
        WITH g AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, GREATEST(len(tok), 1)),
                       i -> CAST('0x' || md5(tok[i] || ' ' || tok[i+1])[1:7] AS BIGINT)))
                       AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
        ),
        blocked AS (
            SELECT doc_id, grams, list_min(grams) AS block_key FROM g
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM blocked a JOIN blocked b
              ON a.block_key = b.block_key AND a.doc_id < b.doc_id
        ),
        scored AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS n_shared,
                   CAST(len(x.grams) AS BIGINT) AS n_a,
                   CAST(len(y.grams) AS BIGINT) AS n_b
            FROM cand c
            JOIN g x ON x.doc_id = c.doc_a
            JOIN g y ON y.doc_id = c.doc_b
        )
        SELECT doc_a, doc_b, n_shared,
               CAST(n_shared AS DOUBLE) / n_a AS cont_a_in_b,
               CAST(n_shared AS DOUBLE) / n_b AS cont_b_in_a
        FROM scored
        WHERE CAST(n_shared AS DOUBLE) / LEAST(n_a, n_b) >= 0.5
    """,
    doc=(
        "N-gram containment scoring for sub-document detection: "
        "containment C(A in B) = |A∩B| / |A| is the asymmetric "
        "complement of q_dedup_ngram_jaccard — a short quotation "
        "inside a long document scores near 1.0 on containment while "
        "its Jaccard stays tiny. Same hashed-bigram sets and min-gram "
        "1-perm blocking as the Jaccard pass (the shared persisted "
        "bigram table is the reusable index at scale); the emitted "
        "pair keeps both directions plus the exact shared-gram count "
        "(integer), thresholded on max-containment >= 0.5."
    ),
    tags=("dedup", "ngram", "containment"),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import bigram_table as _bigram_table

    g = _bigram_table(spark, sf_dir)
    blocked = g.select("doc_id", F.array_min("grams").alias("block_key"))
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x, y = g.alias("x"), g.alias("y")
    n_shared = F.size(F.array_intersect(F.col("x.grams"), F.col("y.grams"))).cast("long")
    n_a = F.size(F.col("x.grams")).cast("long")
    n_b = F.size(F.col("y.grams")).cast("long")
    scored = (
        cand.join(x, cand.doc_a == F.col("x.doc_id"))
        .join(y, cand.doc_b == F.col("y.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            n_shared.alias("n_shared"),
            n_a.alias("n_a"),
            n_b.alias("n_b"),
        )
    )
    return scored.filter(
        F.col("n_shared").cast("double") / F.least("n_a", "n_b") >= CONTAINMENT_THRESHOLD
    ).select(
        "doc_a",
        "doc_b",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("n_a")).alias("cont_a_in_b"),
        (F.col("n_shared").cast("double") / F.col("n_b")).alias("cont_b_in_a"),
    )


# ---------------------------------------------------------------------------
# Holt-Winters seasonal forecast over the dense hourly activity series
# ---------------------------------------------------------------------------


_HW_M = 24  # season length (hours)

# dyadic smoothing constants: 0.5/0.25/0.75 are exact binary doubles,
# so (1-alpha) etc. are unambiguous on every engine and the recursion
# replays bit-exactly in SQL (round-3 verdict #8)
_HW_SNEW = (
    "(CAST(0.5 AS DOUBLE) * (i.ys[r.t + 1] - r.seas[(r.t % 24) + 1])"
    " + CAST(0.5 AS DOUBLE) * (r.s + r.b))"
)

_HW_ORACLE = f"""
    WITH RECURSIVE counts AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hour_idx,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) AS hmin,
               MAX(CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) AS hmax
        FROM events
    ),
    dense AS (
        SELECT t.event_type, g.hr AS hour_idx,
               CAST(COALESCE(c.c, 0) AS DOUBLE) AS y
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT UNNEST(range(hmin, hmax + 1)) AS hr FROM bounds) g
        LEFT JOIN counts c
          ON c.event_type = t.event_type AND c.hour_idx = g.hr
    ),
    inits AS MATERIALIZED (
        SELECT event_type, ys, n, m1,
               (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[25:48]),
                            (a, x) -> a + x) / CAST(24 AS DOUBLE) - m1)
                   / CAST(24 AS DOUBLE) AS b0,
               list_transform(ys[1:24], v -> v - m1) AS seas0
        FROM (
            SELECT event_type, ys, len(ys) AS n,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[1:24]),
                               (a, x) -> a + x) / CAST(24 AS DOUBLE) AS m1
            FROM (
                SELECT event_type, LIST(y ORDER BY hour_idx) AS ys
                FROM dense GROUP BY event_type
            )
        ) WHERE n >= 48
    ),
    rec(event_type, t, s, b, seas) AS (
        SELECT event_type, 24, m1, b0, seas0 FROM inits
        UNION ALL
        SELECT r.event_type, r.t + 1,
               {_HW_SNEW},
               CAST(0.25 AS DOUBLE) * ({_HW_SNEW} - r.s)
                   + CAST(0.75 AS DOUBLE) * r.b,
               list_transform(range(1, 25), k -> CASE
                   WHEN k = (r.t % 24) + 1
                   THEN CAST(0.25 AS DOUBLE)
                            * (i.ys[r.t + 1] - {_HW_SNEW})
                        + CAST(0.75 AS DOUBLE) * r.seas[k]
                   ELSE r.seas[k] END)
        FROM rec r JOIN inits i USING (event_type)
        WHERE r.t < i.n
    )
    SELECT r.event_type, i.n AS n_obs, r.s AS level, r.b AS trend,
           list_aggregate(r.seas, 'max') - list_aggregate(r.seas, 'min')
               AS season_amplitude,
           r.s + r.b + r.seas[(i.n % 24) + 1] AS forecast_next
    FROM rec r JOIN inits i USING (event_type)
    WHERE r.t = i.n
"""


@register(
    "q_events_holt_winters",
    oracle=_HW_ORACLE,
    doc=(
        "Additive Holt-Winters (level + trend + 24-hour seasonality, "
        "alpha=0.5 beta=0.25 gamma=0.25) over each event type's hourly "
        "activity series (operators/downsample.holt_winters_forecast). "
        "The series is built dense first — global hour grid from "
        "integer epoch arithmetic, zero-filled left join, the "
        "resample-gapfill pattern — because the seasonal recursion "
        "indexes hours positionally. The expensive part (per-hour "
        "counts) is one partial-aggregable groupBy over the fact "
        "table; the recursion then runs per series on the "
        "period-bounded hourly rollup (720 points at 30 days), so "
        "Arrow moves a fixed-size series per type regardless of raw "
        "event volume. Oracle-exact (round-3 verdict #8): inputs are "
        "integer counts cast to double, the kernel's season-mean "
        "initialization is a sequential left fold (= list_reduce), "
        "the smoothing constants are dyadic, and the triple recursion "
        "— including the 24-slot seasonal vector — is replayed "
        "op-for-op by a recursive CTE carrying the seasonal LIST as "
        "state. Bit-identical floats, no quantization."
    ),
    tags=("timeseries", "forecast", "pandas-udf"),
)
def q_events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.downsample import holt_winters_forecast

    e = load(spark, sf_dir, "events")
    hidx = F.expr("unix_micros(ts) div 3600000000")
    counts = e.groupBy("event_type", hidx.alias("hour_idx")).agg(
        F.count("*").alias("c")
    )
    bounds = e.agg(
        F.min(hidx).alias("hmin"), F.max(hidx).alias("hmax")
    )
    hours = bounds.select(
        F.explode(F.sequence("hmin", "hmax")).alias("hour_idx")
    )
    types = e.select("event_type").distinct()
    grid = hours.crossJoin(F.broadcast(types))
    dense = grid.join(counts, ["event_type", "hour_idx"], "left").select(
        "event_type",
        "hour_idx",
        F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("hourly_avg"),
    )
    return holt_winters_forecast(dense, alpha=0.5, beta=0.25, gamma=0.25)


# ---------------------------------------------------------------------------
# TPC-H Q6 (forecasting revenue change) through the SQL entry point
# ---------------------------------------------------------------------------

_Q6_BODY = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST(l_discount AS DECIMAL(12,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM {lineitem}
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register(
    "q_sql_tpch_q6",
    oracle=_Q6_BODY.format(lineitem="lineitem"),
    doc=(
        "TPC-H Q6 (forecasting revenue change) through the SQL entry "
        "point: the purest pushdown probe — every predicate "
        "(shipdate range, discount band, quantity cap) reaches the "
        "parquet scan as a pushed filter, the scan reads only 3 "
        "columns, and the whole query is one partial-aggregable "
        "scan+agg with no shuffle beyond the single-row final combine. "
        "Revenue is DECIMAL-exact with one DOUBLE cast."
    ),
    tags=("sql", "agg", "pushdown"),
)
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q6_v")
    return spark.sql(_Q6_BODY.format(lineitem="lineitem_q6_v"))


# ---------------------------------------------------------------------------
# TPC-H Q18 (large-volume customers) through the SQL entry point
# ---------------------------------------------------------------------------

_Q18_TABLES = ("customer", "orders", "lineitem")
_Q18_BODY = """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
    FROM {customer} c
    JOIN {orders} o ON c.c_custkey = o.o_custkey
    JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM {lineitem}
        GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
"""


@register(
    "q_sql_tpch_q18",
    oracle=_Q18_BODY.format(**{t: t for t in _Q18_TABLES}),
    doc=(
        "TPC-H Q18 (large-volume customers) through the SQL entry "
        "point: the IN-subquery over a grouped HAVING is the classic "
        "semi-join decorrelation test — Catalyst rewrites it to an "
        "aggregate + semi join, never a per-row subquery. Quantity "
        "sums are DECIMAL-exact on both engines; the top-100 is "
        "deterministic via the orderkey tie-break."
    ),
    tags=("sql", "join", "agg", "subquery"),
)
def q_sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = {}
    for t in _Q18_TABLES:
        v = f"{t}_q18_v"
        load(spark, sf_dir, t).createOrReplaceTempView(v)
        views[t] = v
    return spark.sql(_Q18_BODY.format(**views))


# ---------------------------------------------------------------------------
# overlapping-window document chunking (LM preprocessing)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 16  # tokens per chunk
CHUNK_STRIDE = 12  # overlap = 4 tokens


@register(
    "q_text_chunk_overlap",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tok,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        k AS (
            SELECT doc_id, tok, n,
                   1 + (GREATEST(n - {CHUNK_SIZE}, 0) + {CHUNK_STRIDE} - 1)
                       // {CHUNK_STRIDE} AS n_chunks
            FROM t
        ),
        chunks AS (
            SELECT doc_id, n_chunks,
                   UNNEST(range(0, n_chunks)) AS chunk_id,
                   tok, n
            FROM k
        )
        SELECT doc_id,
               CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(n_chunks AS INTEGER) AS n_chunks,
               CAST(len(list_slice(tok, chunk_id * {CHUNK_STRIDE} + 1,
                        LEAST(chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}, n))) AS INTEGER)
                   AS chunk_len,
               md5(list_aggregate(list_slice(tok, chunk_id * {CHUNK_STRIDE} + 1,
                        LEAST(chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)), 'string_agg', ' '))
                   AS chunk_fp
        FROM chunks
    """,
    doc=(
        "Overlapping-window document chunking for LM training: fixed "
        "16-token windows at stride 12 (4-token overlap), the standard "
        "context-window preprocessing complement to q_pack_concat_"
        "chunks' concat-and-chunk. Chunk counts come from closed-form "
        "integer arithmetic (no loops), the fan-out is a lateral "
        "explode of a per-doc index sequence, and each chunk carries "
        "its md5 fingerprint so downstream chunk-level dedup can join "
        "on it. Everything is expression-level: slice/explode/md5 in "
        "whole-stage codegen, shuffle-free (fan-out is a narrow map)."
    ),
    tags=("text-analysis", "llm-pipeline", "chunking"),
)
def q_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = F.split("text", " ")
    n = F.size(tok)
    base = d.select(
        "doc_id",
        tok.alias("tok"),
        n.alias("n"),
        F.expr(
            f"1 + (greatest(size(split(text, ' ')) - {CHUNK_SIZE}, 0)"
            f" + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE}"
        ).cast("int").alias("n_chunks"),
    )
    exploded = base.select(
        "doc_id",
        "n_chunks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
        "tok",
        "n",
    )
    chunk = F.slice(
        F.col("tok"),
        F.col("chunk_id") * CHUNK_STRIDE + 1,
        F.least(
            F.col("chunk_id") * CHUNK_STRIDE + CHUNK_SIZE, F.col("n")
        )
        - F.col("chunk_id") * CHUNK_STRIDE,
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "n_chunks",
        F.size(chunk).cast("int").alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


# ---------------------------------------------------------------------------
# Lloyd's k-means over embeddings (2 unrolled iterations, k=8)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2
_EMB_DIM = 64


def _kmeans_dist_duck(emb: str, cent: str) -> str:
    d = f"(CAST({emb}[i] AS DOUBLE) - {cent}[i])"
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {_EMB_DIM + 1}),"
        f" i -> {d} * {d})), (acc, x) -> acc + x)"
    )


def _kmeans_cte_parts() -> list[str]:
    """The shared CTE chain cent0 → a0 → cent1 → … → a{ITERS} (final
    assignment over the learned centroids) — reused by the training
    query's oracle and the learned-IVF search oracle."""
    # MATERIALIZED: DuckDB inlines CTEs per reference (the MMR-oracle
    # lesson, plans/analytics_wave10.py) — the finals a{ITERS}/cent{ITERS}
    # fan out to many consumers (gprobe/xprobe/l1/medoids/...) in the
    # graph-ANN oracles, and the chain itself re-executes per inline;
    # the frames are tiny (n x 1 assignment, k centroids), so
    # materialization costs nothing and collapses the replay to once
    assign_tpl = """
        a{k} AS MATERIALIZED (
            SELECT vec_id, embedding, cid, d2 FROM (
                SELECT e.vec_id, e.embedding, c.cid, {dist} AS d2,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id ORDER BY {dist} ASC, c.cid ASC
                       ) AS rn
                FROM embeddings e CROSS JOIN cent{k} c
            ) WHERE rn = 1
        )"""
    recompute_tpl = """
        cent{k1} AS MATERIALIZED (
            SELECT cid, LIST(m ORDER BY pos ASC) AS c FROM (
                SELECT cid, pos,
                       CAST(SUM(CAST(CAST(comp AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS m
                FROM (
                    SELECT cid, UNNEST(range(1, len(embedding) + 1)) - 1 AS pos,
                           UNNEST(embedding) AS comp
                    FROM a{k}
                )
                GROUP BY cid, pos
            ) GROUP BY cid
        )"""
    parts = [
        f"""
        cent0 AS (
            SELECT vec_id AS cid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
            FROM embeddings WHERE vec_id < {KMEANS_K}
        )"""
    ]
    for k in range(KMEANS_ITERS):
        parts.append(assign_tpl.format(k=k, dist=_kmeans_dist_duck("e.embedding", "c.c")))
        parts.append(recompute_tpl.format(k=k, k1=k + 1))
    parts.append(
        assign_tpl.format(
            k=KMEANS_ITERS, dist=_kmeans_dist_duck("e.embedding", "c.c")
        )
    )
    return parts


def _kmeans_oracle() -> str:
    parts = _kmeans_cte_parts()
    norm = (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {_EMB_DIM + 1}),"
        f" i -> c.c[i] * c.c[i])), (acc, x) -> acc + x)"
    )
    return (
        "WITH " + ",".join(parts) + f"""
        SELECT a.cid,
               COUNT(*) AS n_points,
               ROUND(CAST(SUM(CAST(a.d2 AS DECIMAL(25,12))) AS DOUBLE), 6) AS inertia,
               ROUND(MIN(c.c[1]), 9) AS c_first,
               ROUND(MIN(c.c[{_EMB_DIM}]), 9) AS c_last,
               ROUND(MIN({norm}), 9) AS c_norm2
        FROM a{KMEANS_ITERS} a JOIN cent{KMEANS_ITERS} c ON c.cid = a.cid
        GROUP BY a.cid
    """
    )


def _kmeans_dist_col(emb_col: str, cent_col: str):
    def step(acc, i):
        d = F.element_at(F.col(emb_col), i.cast("int")).cast("double") - F.element_at(
            F.col(cent_col), i.cast("int")
        )
        return acc + d * d

    return F.aggregate(F.sequence(F.lit(1), F.lit(_EMB_DIM)), F.lit(0.0), step)


def _kmeans_assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
    d2 = _kmeans_dist_col("embedding", "c")
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    return (
        points.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "cid", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _kmeans_recompute(assigned: DataFrame) -> DataFrame:
    comp = assigned.select("cid", F.posexplode("embedding").alias("pos", "comp"))
    means = comp.groupBy("cid", "pos").agg(
        (
            F.sum(F.col("comp").cast("double").cast("decimal(18,9)")).cast("double")
            / F.count("*").cast("double")
        ).alias("m")
    )
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
        ).alias("c")
    )


def kmeans_final_assignment(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(learned centroids, final assignment) after KMEANS_ITERS rounds.

    Both cached and persisted per (session, sf_dir) like the dedup
    signature tables: the trained model and the cell index are the
    artifacts an ANN pipeline materializes once — the training query
    and the learned-IVF search both read them.
    """
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build():
        e = load(spark, sf_dir, "embeddings")
        cent = e.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("c"),
        )
        for _ in range(KMEANS_ITERS):
            cent = _kmeans_recompute(_kmeans_assign(e, cent))
        cent = cent.persist()
        return cent, _kmeans_assign(e, cent).persist()

    # _cached stores one value per key; keep the pair as a tuple
    return _cached("kmeans_final", spark, sf_dir, build)


@register(
    "q_emb_kmeans_lloyd",
    oracle=_kmeans_oracle(),
    doc=(
        "Lloyd's k-means over the embedding corpus (k=8, 2 unrolled "
        "iterations, seeds = the first 8 vectors) — the training step "
        "that produces real IVF centroids for q_sim_ann_ivf_learned's "
        "search side. Each iteration is assign (8-row broadcast "
        "centroid join, fixed-order squared-distance fold, "
        "deterministic cid tie-break) + recompute (posexplode to "
        "(cid, dim), DECIMAL-exact component sums, one hash aggregate; "
        "8*64 rows out regardless of corpus size). Inertia sums "
        "per-point distances through DECIMAL so partition order cannot "
        "reorder float adds; the oracle replays the identical "
        "chained-CTE recursion. Per-iteration cost is one broadcast "
        "join + one partial-aggregable shuffle — the 100 TB shape "
        "(PageRank-style unrolled loop, no driver-side state)."
    ),
    tags=("similarity", "ml", "iterative", "scale"),
)
def q_emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    cent, final = kmeans_final_assignment(spark, sf_dir)
    norm2 = F.aggregate(
        F.sequence(F.lit(1), F.lit(_EMB_DIM)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.col("c"), i.cast("int")) * F.element_at(F.col("c"), i.cast("int")),
    )
    return (
        final.join(cent, "cid")
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_points"),
            F.round(
                F.sum(F.col("d2").cast("decimal(25,12)")).cast("double"), 6
            ).alias("inertia"),
            F.round(F.min(F.element_at(F.col("c"), 1)), 9).alias("c_first"),
            F.round(F.min(F.element_at(F.col("c"), _EMB_DIM)), 9).alias("c_last"),
            F.round(F.min(norm2), 9).alias("c_norm2"),
        )
    )


# ---------------------------------------------------------------------------
# domain re-balancing: sample toward an equal language mix
# ---------------------------------------------------------------------------

_MIX_HASH_SPACE = 268_435_456  # 2^28 — md5 prefix of 7 hex digits


@register(
    "q_sample_target_mix",
    oracle=f"""
        WITH counts AS (
            SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang
        ),
        totals AS (
            SELECT CAST(SUM(n_l) AS BIGINT) // 2 // COUNT(*) AS t_per_lang
            FROM counts
        ),
        rates AS (
            SELECT c.lang, c.n_l,
                   LEAST(1.0, CAST(t.t_per_lang AS DOUBLE) / CAST(c.n_l AS DOUBLE))
                       AS rate,
                   CAST(FLOOR(LEAST(1.0, CAST(t.t_per_lang AS DOUBLE)
                                         / CAST(c.n_l AS DOUBLE))
                              * {_MIX_HASH_SPACE}) AS BIGINT) AS thr
            FROM counts c CROSS JOIN totals t
        ),
        sampled AS (
            SELECT d.lang, r.n_l, r.rate,
                   CASE WHEN CAST('0x' || md5('mix:' || CAST(d.doc_id AS VARCHAR))[1:7]
                             AS BIGINT) < r.thr THEN 1 ELSE 0 END AS keep
            FROM documents d JOIN rates r ON d.lang = r.lang
        ),
        per_lang AS (
            SELECT lang, MIN(n_l) AS n_docs, ROUND(MIN(rate), 9) AS sample_rate,
                   CAST(SUM(keep) AS BIGINT) AS n_sampled
            FROM sampled GROUP BY lang
        )
        SELECT lang, n_docs, sample_rate, n_sampled,
               ROUND(CAST(n_sampled AS DOUBLE)
                     / CAST(SUM(n_sampled) OVER () AS DOUBLE), 6) AS achieved_share
        FROM per_lang
    """,
    doc=(
        "Domain re-balancing toward a target mix — the LM-corpus "
        "operator that q_sample_stratified's fixed rates can't express: "
        "acceptance rates are DERIVED from the data (equal share per "
        "language within a half-corpus token budget, capped at 1.0 for "
        "under-represented languages). Selection is the same seeded-md5 "
        "deterministic hash (never rand(): reproducible across runs, "
        "engines, partitionings), compared against an integer "
        "threshold in the 2^28 hash space so no float comparison sits "
        "on a boundary. One groupBy for counts, broadcast rates back, "
        "one partial-aggregable rollup; the achieved-share denominator "
        "joins in as a broadcast scalar (no window at all)."
    ),
    tags=("sampling", "corpus", "llm-pipeline"),
)
def q_sample_target_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_l"))
    totals = counts.agg(
        F.expr("(cast(sum(n_l) as bigint) div 2) div count(*)").alias("t_per_lang")
    )
    rate = F.least(
        F.lit(1.0), F.col("t_per_lang").cast("double") / F.col("n_l").cast("double")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_l",
        rate.alias("rate"),
        F.floor(rate * _MIX_HASH_SPACE).cast("bigint").alias("thr"),
    )
    bucket = F.expr(
        "cast(conv(substring(md5(concat('mix:', cast(doc_id as string))), 1, 7),"
        " 16, 10) as bigint)"
    )
    sampled = d.join(F.broadcast(rates), "lang").select(
        "lang",
        "n_l",
        "rate",
        F.when(bucket < F.col("thr"), 1).otherwise(0).alias("keep"),
    )
    per_lang = sampled.groupBy("lang").agg(
        F.min("n_l").alias("n_docs"),
        F.round(F.min("rate"), 9).alias("sample_rate"),
        F.sum("keep").cast("bigint").alias("n_sampled"),
    )
    tot_sampled = per_lang.agg(F.sum("n_sampled").alias("__tot_sampled"))
    return (
        per_lang.crossJoin(F.broadcast(tot_sampled))
        .select(
            "lang",
            "n_docs",
            "sample_rate",
            "n_sampled",
            F.round(
                F.col("n_sampled").cast("double") / F.col("__tot_sampled").cast("double"),
                6,
            ).alias("achieved_share"),
        )
    )


# ---------------------------------------------------------------------------
# hierarchical percent-of-parent rollup (nation -> region -> total)
# ---------------------------------------------------------------------------


@register(
    "q_agg_pct_of_parent",
    oracle="""
        WITH nat AS (
            SELECT r.r_name AS region, n.n_name AS nation,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name, n.n_name
        ),
        reg AS (
            SELECT region, SUM(rev) AS region_rev FROM nat GROUP BY region
        ),
        tot AS (SELECT SUM(rev) AS total_rev FROM nat)
        SELECT nat.region, nat.nation,
               CAST(nat.rev AS DOUBLE) AS nation_revenue,
               ROUND(CAST(nat.rev AS DOUBLE) / CAST(reg.region_rev AS DOUBLE), 6)
                   AS pct_of_region,
               ROUND(CAST(reg.region_rev AS DOUBLE) / CAST(tot.total_rev AS DOUBLE), 6)
                   AS region_pct_of_total
        FROM nat JOIN reg USING (region) CROSS JOIN tot
    """,
    doc=(
        "Hierarchical percent-of-parent reporting: each nation's share "
        "of its region's revenue and each region's share of the grand "
        "total — the drill-down ratio surface that complements "
        "q_agg_rollup_cube's subtotals and q_win_ratio_to_report's "
        "flat shares. Implemented as re-aggregation + broadcast joins "
        "(child rollup → parent rollup → scalar total), NOT windows: "
        "each level is partial-aggregable and the parent tables are "
        "dimension-sized broadcasts, so no level ever funnels fact "
        "rows through one partition. All revenue partials are "
        "DECIMAL-exact; ratios divide as DOUBLE once, rounded."
    ),
    tags=("aggregate", "join", "reporting"),
)
def q_agg_pct_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev"))
    )
    reg = nat.groupBy("region").agg(F.sum("rev").alias("region_rev"))
    tot = nat.agg(F.sum("rev").alias("total_rev"))
    return (
        nat.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.col("rev").cast("double").alias("nation_revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("region_rev").cast("double"), 6
            ).alias("pct_of_region"),
            F.round(
                F.col("region_rev").cast("double") / F.col("total_rev").cast("double"), 6
            ).alias("region_pct_of_total"),
        )
    )


# ---------------------------------------------------------------------------
# salted skew join as a registry-verified query
# ---------------------------------------------------------------------------


@register(
    "q_join_skew_salted",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
               p.p_brand, p.p_retailprice
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size >= 40
    """,
    doc=(
        "The explicit-salting skew join (operators/skew.salted_join) "
        "surfaced as a driver-verified query: the fact side gets a "
        "deterministic hash-mod salt in [0,8), the filtered part "
        "dimension replicates once per salt, and the join runs on "
        "(key, salt) — a pathologically hot part key spreads across 8 "
        "partitions instead of one straggler task. The oracle is the "
        "plain unsalted join: salting must be result-invariant, which "
        "is exactly what the hash gate proves. No rand() anywhere, so "
        "task retries replay identically."
    ),
    tags=("join", "skew", "scale"),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 40)
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_retailprice")
    )
    return salted_join(li, p, on="l_partkey", n_salts=8, spread_col="l_orderkey")


# ---------------------------------------------------------------------------
# PRODUCT aggregate via fixed-order fold (compound growth)
# ---------------------------------------------------------------------------


@register(
    "q_agg_product",
    oracle="""
        WITH r AS (
            SELECT user_id, event_id, ts,
                   1.0 + CAST(value AS DOUBLE) / 1000.0 AS factor
            FROM events WHERE event_type = 'purchase'
        ),
        folded AS (
            SELECT user_id,
                   COUNT(*) AS n_factors,
                   LIST(factor ORDER BY ts ASC, event_id ASC) AS fs
            FROM r GROUP BY user_id
        )
        SELECT user_id, n_factors,
               ROUND(list_reduce(list_prepend(1.0, fs), (acc, x) -> acc * x), 9)
                   AS compound_factor
        FROM folded
    """,
    doc=(
        "PRODUCT aggregate — compound growth per user from per-purchase "
        "factors (1 + value/1000). SQL has no PRODUCT; the textbook "
        "EXP(SUM(LN(x))) detour loses exactness and diverges between "
        "libm implementations, so both engines instead multiply the "
        "factors in the same explicit (ts, event_id) order: Spark "
        "aggregate() over the frame-collected list == DuckDB "
        "list_reduce, bit-identical float order. Group sizes are "
        "per-user purchase counts (bounded); one shuffle on user_id."
    ),
    tags=("aggregate", "statistics"),
)
def q_agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    factor = (F.lit(1.0) + F.col("value").cast("double") / 1000.0).alias("factor")
    folded = (
        e.select("user_id", "event_id", "ts", factor)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_factors"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "factor"))),
                lambda x: x["factor"],
            ).alias("fs"),
        )
    )
    prod = F.aggregate(F.col("fs"), F.lit(1.0), lambda acc, x: acc * x)
    return folded.select(
        "user_id", "n_factors", F.round(prod, 9).alias("compound_factor")
    )


# ---------------------------------------------------------------------------
# time-constrained funnel (view -> click <=1h -> purchase <=1h)
# ---------------------------------------------------------------------------

FUNNEL_WINDOW_US = 3_600_000_000  # 1 hour


@register(
    "q_events_funnel_windowed",
    oracle=f"""
        WITH staged AS (
            SELECT user_id, event_id, ts, event_type,
                   CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END
                       AS kindr,
                   epoch_us(ts) AS t_us
            FROM events WHERE event_type IN ('view', 'click', 'purchase')
        ),
        with_view AS (
            SELECT *,
                   MAX(CASE WHEN event_type = 'view' THEN t_us END) OVER w AS view_run
            FROM staged
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, kindr ASC, event_id ASC
                         ROWS UNBOUNDED PRECEDING)
        ),
        with_qclick AS (
            SELECT *,
                   MAX(CASE WHEN event_type = 'click'
                             AND view_run >= t_us - {FUNNEL_WINDOW_US}
                            THEN t_us END) OVER w AS qclick_run
            FROM with_view
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, kindr ASC, event_id ASC
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
                   AS n_users_view,
               COUNT(DISTINCT CASE WHEN event_type = 'click'
                                    AND view_run >= t_us - {FUNNEL_WINDOW_US}
                                   THEN user_id END) AS n_users_qualified_click,
               COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                    AND qclick_run >= t_us - {FUNNEL_WINDOW_US}
                                   THEN user_id END) AS n_users_converted
        FROM with_qclick
    """,
    doc=(
        "Time-constrained funnel: a conversion is a purchase within 1 h "
        "of a click that itself followed a view within 1 h — the "
        "windowed complement of q_events_funnel's order-only "
        "conversion. Chained running-frame MAXes (view timestamps, "
        "then qualified-click timestamps) resolve both hops in two "
        "window passes over the SAME user_id sort — one shuffle, no "
        "self-joins, no per-stage subqueries; same-timestamp events "
        "order view < click < purchase so instantaneous hops count."
    ),
    tags=("window", "timeseries", "funnel"),
)
def q_events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    kindr = (
        F.when(F.col("event_type") == "view", 0)
        .when(F.col("event_type") == "click", 1)
        .otherwise(2)
    )
    t_us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), kindr.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = e.select("user_id", "event_id", "ts", "event_type", t_us.alias("t_us"))
    view_run = F.max(
        F.when(F.col("event_type") == "view", F.col("t_us"))
    ).over(w)
    with_view = staged.withColumn("view_run", view_run)
    qclick = F.when(
        (F.col("event_type") == "click")
        & (F.col("view_run") >= F.col("t_us") - FUNNEL_WINDOW_US),
        F.col("t_us"),
    )
    with_qclick = with_view.withColumn("qclick_run", F.max(qclick).over(w))
    return with_qclick.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("n_users_view"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("view_run") >= F.col("t_us") - FUNNEL_WINDOW_US),
                F.col("user_id"),
            )
        ).alias("n_users_qualified_click"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("qclick_run") >= F.col("t_us") - FUNNEL_WINDOW_US),
                F.col("user_id"),
            )
        ).alias("n_users_converted"),
    )


# ---------------------------------------------------------------------------
# IVF search over the LEARNED centroids (train -> index -> search)
# ---------------------------------------------------------------------------

IVF_LEARNED_TOP_K = 5
IVF_LEARNED_N_QUERIES = 5


def _ivf_learned_oracle() -> str:
    n = KMEANS_ITERS
    dist_qv = _kmeans_dist_duck("q.embedding", "v.embedding").replace(
        "CAST(q.embedding[i] AS DOUBLE) - v.embedding[i]",
        "CAST(q.embedding[i] AS DOUBLE) - CAST(v.embedding[i] AS DOUBLE)",
    )
    return (
        "WITH "
        + ",".join(_kmeans_cte_parts())
        + f""",
        q AS (
            SELECT vec_id AS query_id, embedding, cid AS cell
            FROM a{n} WHERE vec_id < {IVF_LEARNED_N_QUERIES}
        )
        SELECT query_id, vec_id, cell, d2q, k_rank FROM (
            SELECT q.query_id, v.vec_id, v.cid AS cell,
                   ROUND({dist_qv}, 9) AS d2q,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {dist_qv} ASC, v.vec_id ASC
                   ) AS k_rank
            FROM q JOIN a{n} v
              ON v.cid = q.cell AND v.vec_id <> q.query_id
        ) WHERE k_rank <= {IVF_LEARNED_TOP_K}
    """
    )


@register(
    "q_sim_ann_ivf_learned",
    oracle=_ivf_learned_oracle(),
    doc=(
        "The full train → index → search ANN pipeline: IVF retrieval "
        "whose cells are the k-means centroids learned by "
        "q_emb_kmeans_lloyd (shared session-cached model + assignment, "
        "so training never re-runs per consumer). Each of the first 5 "
        "vectors queries its own learned cell (nprobe=1) and returns "
        "the 5 nearest neighbours by the same fixed-order "
        "squared-distance fold used in training — metric-consistent "
        "end to end. Search cost is |cell| per query, never the "
        "corpus; the oracle replays training and search as one CTE "
        "chain."
    ),
    tags=("similarity", "ann", "ivf", "ml"),
)
def q_sim_ann_ivf_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, final = kmeans_final_assignment(spark, sf_dir)
    cells = final.select("vec_id", "embedding", F.col("cid").alias("cell"))
    q = cells.filter(F.col("vec_id") < IVF_LEARNED_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell").alias("q_cell"),
    )

    def step(acc, i):
        d = F.element_at(F.col("q_emb"), i.cast("int")).cast("double") - F.element_at(
            F.col("embedding"), i.cast("int")
        ).cast("double")
        return acc + d * d

    d2q = F.aggregate(F.sequence(F.lit(1), F.lit(_EMB_DIM)), F.lit(0.0), step)
    w = Window.partitionBy("query_id").orderBy(F.col("d2q_raw").asc(), F.col("vec_id").asc())
    return (
        cells.join(
            F.broadcast(q),
            (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "cell", d2q.alias("d2q_raw"))
        .withColumn("k_rank", F.row_number().over(w))
        .filter(F.col("k_rank") <= IVF_LEARNED_TOP_K)
        .select(
            "query_id",
            "vec_id",
            "cell",
            F.round(F.col("d2q_raw"), 9).alias("d2q"),
            "k_rank",
        )
    )


# ---------------------------------------------------------------------------
# per-document perplexity under the corpus bigram LM
# ---------------------------------------------------------------------------


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, bigram) stream — cheap map-side explode, built per
    consumer (never persisted: it is corpus-sized)."""
    d = load(spark, sf_dir, "documents")
    tok = F.expr("filter(split(text, ' '), t -> t <> '')")
    return (
        d.select("doc_id", tok.alias("tok"))
        .filter(F.size("tok") >= 2)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, size(tok) - 2),"
                    " i -> concat(tok[i], ' ', tok[i + 1]))"
                )
            ).alias("pos0", "bigram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "bigram")
    )


def bigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached corpus bigram LM: (bigram, p = c(w1 w2)/c(w1 ·)).

    One persisted vocabulary-bounded table per (session, sf_dir), shared
    by q_text_perplexity_bigram, q_text_ccnet_buckets and
    q_quality_ensemble — the round-2 verdict's fix for the per-call
    ``bc.persist()`` that stranded a cached bigram table per invocation.
    The intermediate count table is persisted only inside the build
    (it feeds both the numerator and the prefix marginal), materialized
    eagerly, and unpersisted before returning, so steady state is
    exactly one cached model table.
    """
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build() -> DataFrame:
        doc_big = _doc_bigrams(spark, sf_dir)
        bc = doc_big.groupBy("bigram").agg(F.count("*").alias("c_bigram")).persist()
        prefix = F.split(F.col("bigram"), " ")[0]
        pc = bc.groupBy(prefix.alias("prefix")).agg(
            F.sum("c_bigram").alias("c_prefix")
        )
        model = (
            bc.join(F.broadcast(pc), prefix == F.col("prefix"))
            .select(
                "bigram",
                (
                    F.col("c_bigram").cast("double") / F.col("c_prefix").cast("double")
                ).alias("p"),
            )
            .persist()
        )
        model.count()  # materialize so the count table can be released now
        bc.unpersist()
        return model

    return _cached("bigram_model", spark, sf_dir, build)


@register(
    "q_text_perplexity_bigram",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        doc_big AS (
            SELECT doc_id,
                   UNNEST(range(1, len(tok))) AS pos,
                   UNNEST(list_transform(range(1, len(tok)),
                          i -> tok[i] || ' ' || tok[i + 1])) AS bigram
            FROM tok WHERE len(tok) >= 2
        ),
        bc AS (
            SELECT bigram, COUNT(*) AS c_bigram FROM doc_big GROUP BY bigram
        ),
        pc AS (
            SELECT string_split(bigram, ' ')[1] AS prefix, SUM(c_bigram) AS c_prefix
            FROM bc GROUP BY 1
        ),
        model AS (
            SELECT bc.bigram,
                   CAST(bc.c_bigram AS DOUBLE) / CAST(pc.c_prefix AS DOUBLE) AS p
            FROM bc JOIN pc ON string_split(bc.bigram, ' ')[1] = pc.prefix
        ),
        scored AS (
            SELECT d.doc_id, d.pos, LN(m.p) AS lnp
            FROM doc_big d JOIN model m ON m.bigram = d.bigram
        ),
        folded AS (
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   LIST(lnp ORDER BY pos ASC) AS ls
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               ROUND(-list_reduce(list_prepend(0.0, ls), (acc, x) -> acc + x)
                     / CAST(n_bigrams AS DOUBLE), 6) AS avg_nll
        FROM folded
    """,
    doc=(
        "Per-document average negative log-likelihood under the "
        "corpus's own bigram LM — the perplexity-style quality signal "
        "LM pipelines filter on (high avg_nll = the document's word "
        "transitions are rare in the corpus). The model is the exact "
        "conditional ratio c(w1 w2)/c(w1 ·) (integers → one DOUBLE "
        "division); per-token LN terms fold in explicit position order "
        "on both engines; avg_nll rather than exp(avg) keeps libm's "
        "exp out of the comparison. Three partial-aggregated shuffles "
        "(bigram counts, prefix counts, per-doc fold) + one model "
        "join — at corpus scale the model is a table join, never a "
        "driver-side dictionary."
    ),
    tags=("text-analysis", "lm", "llm-pipeline"),
)
def q_text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_big = _doc_bigrams(spark, sf_dir)
    model = bigram_model(spark, sf_dir)
    scored = doc_big.join(model, "bigram").select(
        "doc_id", "pos", F.log(F.col("p")).alias("lnp")
    )
    folded = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lnp"))), lambda x: x["lnp"]
        ).alias("ls"),
    )
    s = F.aggregate(F.col("ls"), F.lit(0.0), lambda acc, x: acc + x)
    return folded.select(
        "doc_id",
        "n_bigrams",
        F.round(-s / F.col("n_bigrams").cast("double"), 6).alias("avg_nll"),
    )


# ---------------------------------------------------------------------------
# top-k 3-event user paths (sequence mining)
# ---------------------------------------------------------------------------

PATHS_TOP_K = 10


@register(
    "q_events_paths_topk",
    oracle=f"""
        WITH seq AS (
            SELECT user_id,
                   LAG(event_type, 2) OVER w AS t1,
                   LAG(event_type, 1) OVER w AS t2,
                   event_type AS t3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT t1 || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
        FROM seq WHERE t1 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, path ASC
        LIMIT {PATHS_TOP_K}
    """,
    doc=(
        "Top-10 three-event user paths (sequence mining): two LAGs "
        "inside one user_id sort build each sliding event trigram, a "
        "partial-aggregable groupBy counts paths (at most "
        "|event_types|^3 keys — bounded whatever the event volume), "
        "and the global top-10 plans as TakeOrderedAndProject with a "
        "lexical tie-break. One fact shuffle total."
    ),
    tags=("window", "timeseries", "sequence"),
)
def q_events_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = e.select(
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    ).filter(F.col("t1").isNotNull())
    path = F.concat_ws(">", "t1", "t2", "t3").alias("path")
    return (
        seq.select(path)
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(PATHS_TOP_K)
    )


# ---------------------------------------------------------------------------
# nearest near-duplicate per document (dedup triage view)
# ---------------------------------------------------------------------------


def _nearest_dup_oracle() -> str:
    from weather_flink_spark.plans.llm_pipeline import NEAR_DUP_PAIRS_SQL

    return f"""
        WITH pairs AS ({NEAR_DUP_PAIRS_SQL}),
        sym AS (
            SELECT doc_a AS doc_id, doc_b AS other_id, jaccard FROM pairs
            UNION ALL
            SELECT doc_b AS doc_id, doc_a AS other_id, jaccard FROM pairs
        )
        SELECT doc_id, other_id AS nearest_dup, jaccard FROM (
            SELECT doc_id, other_id, jaccard,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY jaccard DESC, other_id ASC
                   ) AS rn
            FROM sym
        ) WHERE rn = 1
    """


@register(
    "q_dedup_nearest_per_doc",
    oracle=_nearest_dup_oracle(),
    doc=(
        "Dedup triage view: for every document with at least one "
        "verified near-duplicate, its single closest match (highest "
        "Jaccard, doc-id tie-break). Rides the session-cached verified "
        "pair table — zero new pair generation — symmetrized and "
        "ranked with one window over the pair list (|pairs| rows, a "
        "sliver of the corpus), so the triage view is essentially free "
        "once the dedup pass has run."
    ),
    tags=("dedup", "lsh", "reporting"),
)
def q_dedup_nearest_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import near_dup_pairs

    pairs = near_dup_pairs(spark, sf_dir)
    sym = pairs.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("other_id"), "jaccard"
    ).unionAll(
        pairs.select(
            F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("other_id"), "jaccard"
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("other_id").asc()
    )
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("other_id").alias("nearest_dup"), "jaccard")
    )


# ---------------------------------------------------------------------------
# join-key skew diagnostics
# ---------------------------------------------------------------------------

SKEW_TOP_N = 20


@register(
    "q_diag_key_skew",
    oracle=f"""
        WITH freq AS (
            SELECT l_partkey AS key, COUNT(*) AS c FROM lineitem GROUP BY 1
        ),
        stats AS (
            SELECT CAST(MAX(c) AS BIGINT) AS max_c,
                   CAST(SUM(c) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_keys
            FROM freq
        )
        SELECT f.key, CAST(f.c AS BIGINT) AS c,
               ROUND(CAST(f.c AS DOUBLE)
                     / (CAST(s.n_rows AS DOUBLE) / CAST(s.n_keys AS DOUBLE)), 6)
                   AS skew_ratio,
               s.n_keys
        FROM freq f CROSS JOIN stats s
        ORDER BY f.c DESC, f.key ASC
        LIMIT {SKEW_TOP_N}
    """,
    doc=(
        "Join-key skew diagnostics — the profiling pass run before "
        "choosing salting/AQE strategies on a 100 TB join: per-key "
        "frequency of lineitem.l_partkey, each hot key's ratio to the "
        "mean key frequency, and the top-20 hottest keys "
        "(TakeOrderedAndProject, key tie-break). One partial-"
        "aggregable groupBy + a single broadcast stats row; pairs with "
        "operators/skew.salted_join, whose salt count this output "
        "sizes."
    ),
    tags=("diagnostics", "aggregate", "scale"),
)
def q_diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_partkey").alias("key")).agg(F.count("*").alias("c"))
    stats = freq.agg(
        F.max("c").alias("max_c"),
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_keys"),
    )
    mean_c = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return (
        freq.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "c",
            F.round(F.col("c").cast("double") / mean_c, 6).alias("skew_ratio"),
            "n_keys",
        )
        .orderBy(F.col("c").desc(), F.col("key").asc())
        .limit(SKEW_TOP_N)
    )


# ---------------------------------------------------------------------------
# multimodal frame sampling (video-analog UDTF fan-out)
# ---------------------------------------------------------------------------


@register(
    "q_multimodal_frame_sample",
    oracle="""
        WITH t AS (
            SELECT doc_id, text, strlen(text) // 32 AS n_frames FROM documents
        ),
        frames AS (
            SELECT doc_id, UNNEST(range(0, n_frames, 4)) AS frame_idx, text
            FROM t WHERE n_frames > 0
        )
        SELECT doc_id,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(strlen(substr(text, frame_idx * 32 + 1, 32)) AS BIGINT)
                   AS frame_bytes,
               md5(substr(text, frame_idx * 32 + 1, 32)) AS frame_md5
        FROM frames
    """,
    doc=(
        "Multimodal frame sampling surfaced as a driver-verified query: "
        "every 4th 32-byte frame of each opaque payload fans out inside "
        "the Arrow batch (operators/multimodal.sample_frames — the "
        "video keyframe-extraction shape: one row in, N frame rows "
        "out, no shuffle, binary never exploded through an exchange). "
        "Payloads are UTF-8 text bytes (pure-ASCII corpus: byte slices "
        "== char slices), so the DuckDB oracle reproduces each frame "
        "with substr and checks its md5 byte-exactly — the plumbing "
        "proof that a real ffmpeg kernel would inherit."
    ),
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.multimodal import attach_payload, sample_frames

    d = load(spark, sf_dir, "documents")
    frames = sample_frames(attach_payload(d), frame_size=32, stride=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        "frame_bytes",
        F.md5("frame").alias("frame_md5"),
    )


# ---------------------------------------------------------------------------
# A/B test: two-proportion z-test on conversion
# ---------------------------------------------------------------------------


@register(
    "q_stats_ab_proportions",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST('0x' || md5('ab:' || CAST(user_id AS VARCHAR))[1:7]
                        AS BIGINT) % 2 AS variant,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 95 THEN 1
                            ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT variant,
                   COUNT(*) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM per_user GROUP BY variant
        ),
        wide AS (
            SELECT CAST(MIN(CASE WHEN variant = 0 THEN n_users END) AS BIGINT) AS n0,
                   MIN(CASE WHEN variant = 0 THEN n_converted END) AS c0,
                   CAST(MIN(CASE WHEN variant = 1 THEN n_users END) AS BIGINT) AS n1,
                   MIN(CASE WHEN variant = 1 THEN n_converted END) AS c1
            FROM cells
        )
        SELECT n0, c0, n1, c1,
               ROUND(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0, 6)
                   AS rate_diff,
               CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
                    ELSE ROUND((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                         / SQRT((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                                * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                                * (1.0 / n0 + 1.0 / n1)), 6) END AS z_score
        FROM wide
    """,
    doc=(
        "A/B experiment readout: deterministic 50/50 variant "
        "assignment from a seeded md5 of the user id (the same "
        "never-rand() discipline as the samplers — assignment is "
        "reproducible across runs and engines), per-user conversion = "
        "any purchase, and the pooled two-proportion z statistic. "
        "Complements q_stats_welch_ttest (means) with the proportions "
        "test every experimentation pipeline runs. All counts are "
        "integer-exact; the only floats are the final ratios and the "
        "IEEE-correctly-rounded SQRT, identical on both engines. Two "
        "partial-aggregable groupBys (user rollup, then 2 cells)."
    ),
    tags=("aggregate", "statistics", "experimentation"),
)
def q_stats_ab_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    variant = F.expr(
        "cast(conv(substring(md5(concat('ab:', cast(user_id as string))), 1, 7),"
        " 16, 10) as bigint) % 2"
    )
    per_user = e.groupBy("user_id").agg(
        F.first(variant).alias("variant"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 95), 1).otherwise(0)
        ).alias("converted"),
    )
    cells = per_user.groupBy("variant").agg(
        F.count("*").alias("n_users"), F.sum("converted").cast("bigint").alias("n_converted")
    )
    wide = cells.agg(
        F.min(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.min(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.min(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.min(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pool = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (p1 - p0) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    degenerate = ((F.col("c0") + F.col("c1")) == 0) | (
        (F.col("c0") + F.col("c1")) == (F.col("n0") + F.col("n1"))
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p1 - p0, 6).alias("rate_diff"),
        F.when(~degenerate, F.round(z, 6)).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# inter-arrival time statistics per event type
# ---------------------------------------------------------------------------


@register(
    "q_events_inter_arrival",
    oracle="""
        WITH gaps AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY event_type ORDER BY ts ASC, event_id ASC
                   )) AS gap_us
            FROM events
        )
        SELECT event_type,
               COUNT(gap_us) AS n_gaps,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               CAST(SUM(gap_us) AS BIGINT) AS total_us,
               ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1000000.0, 6)
                   AS mean_gap_s,
               CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_us) AS DOUBLE)
                   AS p50_gap_us
        FROM gaps GROUP BY event_type
    """,
    doc=(
        "Arrival-process profile per event type: consecutive-event gaps "
        "from one LAG inside the event_type sort, then integer-exact "
        "min/max/sum (microseconds — no float accumulates) plus the "
        "exact interpolated median gap. The mean divides once as "
        "DOUBLE. One shuffle on event_type; the per-type gap count is "
        "the fact volume, all partial-aggregable except the exact "
        "percentile, whose per-group sort rides the shuffle already "
        "paid."
    ),
    tags=("window", "timeseries", "statistics"),
)
def q_events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    gaps = e.select("event_type", gap.alias("gap_us"))
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").alias("total_us"),
        F.round(
            F.sum("gap_us").cast("double") / F.count("gap_us") / 1_000_000.0, 6
        ).alias("mean_gap_s"),
        F.expr("CAST(percentile(gap_us, 0.5) AS DOUBLE)").alias("p50_gap_us"),
    )


# ---------------------------------------------------------------------------
# Zipf-law slope over the corpus vocabulary
# ---------------------------------------------------------------------------

ZIPF_TOP_N = 1000


@register(
    "q_text_zipf_slope",
    oracle=f"""
        WITH tf AS (
            SELECT token, COUNT(*) AS c FROM (
                SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
            ) WHERE token <> '' GROUP BY token
        ),
        top AS (
            SELECT token, c FROM tf ORDER BY c DESC, token ASC LIMIT {ZIPF_TOP_N}
        ),
        ranked AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS r FROM top
        ),
        pts AS (
            SELECT CAST(LN(CAST(r AS DOUBLE)) AS DECIMAL(20,12)) AS x,
                   CAST(LN(CAST(c AS DOUBLE)) AS DECIMAL(20,12)) AS y
            FROM ranked
        ),
        m AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx
            FROM pts
        )
        SELECT n,
               ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
               ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                     / CAST(n AS DOUBLE), 6) AS intercept
        FROM m
    """,
    doc=(
        "Zipf-law fit over the corpus vocabulary: OLS slope of "
        "ln(count) ~ ln(rank) for the top-1000 tokens (natural text "
        "sits near -1; synthetic or template-heavy corpora deviate — a "
        "corpus-health signal). Scale shape: token counts are one "
        "partial-aggregable groupBy, the top-1000 is "
        "TakeOrderedAndProject, and ranking happens on the bounded "
        "1000-row result. Float discipline: each transcendental LN "
        "term is QUANTIZED to DECIMAL(20,12) — one deterministic "
        "rounding per value — so the moment sums are exact decimal "
        "arithmetic, order-independent without any fold; only the "
        "closed-form slope divides as DOUBLE. The same trick lets any "
        "log/exp-derived measure aggregate at scale without "
        "collect_list."
    ),
    tags=("text-analysis", "statistics", "scale"),
)
def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    top = tf.orderBy(F.col("c").desc(), F.col("token").asc()).limit(ZIPF_TOP_N)
    # rank via the distributed two-pass pattern — the input is already
    # bounded by the limit, but this keeps the whole registry free of
    # single-partition Window nodes (tests/test_plans_scale.py walks it)
    ranked = attach_global_row_number(
        top, [F.col("c").desc(), F.col("token").asc()], "r", num_partitions=4
    )
    x = F.log(F.col("r").cast("double")).cast("decimal(20,12)")
    y = F.log(F.col("c").cast("double")).cast("decimal(20,12)")
    m = ranked.select(x.alias("x"), y.alias("y")).agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "n",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# density-based embedding anomaly scoring (random-projection histograms)
# ---------------------------------------------------------------------------

ANOM_N_PLANES = 4
ANOM_N_BINS = 16
ANOM_TOP_N = 20


def _anom_proj_spark(p: int) -> str:
    from weather_flink_spark.plans.llm_extra import _PLANE_SPARK

    return (
        f"aggregate(sequence(1, {_EMB_DIM}), cast(0.0 as double), (acc, i) -> "
        f"acc + cast(element_at(embedding, cast(i as int)) as double)"
        f" * cast({_PLANE_SPARK.format(p=p)} as double))"
    )


def _anom_proj_duck(p: int) -> str:
    from weather_flink_spark.plans.llm_extra import _PLANE_DUCK

    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {_EMB_DIM + 1}),"
        f" i -> CAST(embedding[i] AS DOUBLE)"
        f" * CAST({_PLANE_DUCK.format(p=p)} AS DOUBLE))), (acc, x) -> acc + x)"
    )


def _anom_oracle() -> str:
    projs = ", ".join(f"{_anom_proj_duck(p)} AS x{p}" for p in range(ANOM_N_PLANES))
    bin_exprs = ", ".join(
        f"LEAST(CAST(FLOOR((x{p} - min_x{p}) / (max_x{p} - min_x{p})"
        f" * {ANOM_N_BINS}) AS BIGINT), {ANOM_N_BINS - 1}) AS b{p}"
        for p in range(ANOM_N_PLANES)
    )
    stat_cols = ", ".join(
        f"MIN(x{p}) AS min_x{p}, MAX(x{p}) AS max_x{p}" for p in range(ANOM_N_PLANES)
    )
    melt = " UNION ALL ".join(
        f"SELECT vec_id, {p} AS plane, b{p} AS bin FROM binned"
        for p in range(ANOM_N_PLANES)
    )
    return f"""
        WITH proj AS (
            SELECT vec_id, {projs} FROM embeddings
        ),
        stats AS (SELECT {stat_cols}, COUNT(*) AS n FROM proj),
        binned AS (
            SELECT p.vec_id, {bin_exprs}
            FROM proj p CROSS JOIN stats
        ),
        melted AS ({melt}),
        dens AS (
            SELECT plane, bin, COUNT(*) AS c FROM melted GROUP BY plane, bin
        ),
        scored AS (
            SELECT m.vec_id,
                   CAST(LN(CAST(d.c AS DOUBLE)
                           / (SELECT CAST(n AS DOUBLE) FROM stats))
                        AS DECIMAL(20,12)) AS lnp
            FROM melted m JOIN dens d ON d.plane = m.plane AND d.bin = m.bin
        )
        SELECT vec_id,
               ROUND(CAST(-SUM(lnp) AS DOUBLE) / {ANOM_N_PLANES}, 6) AS anomaly_score
        FROM scored GROUP BY vec_id
        ORDER BY anomaly_score DESC, vec_id ASC
        LIMIT {ANOM_TOP_N}
    """


@register(
    "q_emb_anomaly_density",
    oracle=_anom_oracle(),
    doc=(
        "Density-based embedding anomaly scoring — the isolation-"
        "forest-flavored op expressed declaratively: each vector "
        "projects onto 4 fixed integer hyperplanes (the deterministic "
        "LCG planes shared with the sign-LSH dedup), each projection "
        "buckets into 16 equal-width bins over the observed range, and "
        "a vector's anomaly score is the mean negative log of its "
        "bins' occupancy mass — points in sparse histogram cells "
        "across several projections score high. LN terms quantize to "
        "DECIMAL(20,12) (the Zipf trick) so per-vector sums are exact "
        "and order-independent; the top-20 is deterministic. Cost: one "
        "projection scan, a 4x melt, a 64-cell density table joined "
        "back broadcast — fully partial-aggregable at corpus scale."
    ),
    tags=("similarity", "statistics", "anomaly", "llm-pipeline"),
)
def q_emb_anomaly_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    # snapshot the projections: the min/max stats and the binning pass
    # both read them (one projection pass instead of two) (r11)
    proj = e.select(
        "vec_id",
        *[F.expr(_anom_proj_spark(p)).alias(f"x{p}") for p in range(ANOM_N_PLANES)],
    ).transform(snapshot(eager=False))
    stats = proj.agg(
        F.count("*").alias("n"),
        *[F.min(f"x{p}").alias(f"min_x{p}") for p in range(ANOM_N_PLANES)],
        *[F.max(f"x{p}").alias(f"max_x{p}") for p in range(ANOM_N_PLANES)],
    )
    binned = proj.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        "n",
        *[
            F.least(
                F.floor(
                    (F.col(f"x{p}") - F.col(f"min_x{p}"))
                    / (F.col(f"max_x{p}") - F.col(f"min_x{p}"))
                    * ANOM_N_BINS
                ).cast("bigint"),
                F.lit(ANOM_N_BINS - 1),
            ).alias(f"b{p}")
            for p in range(ANOM_N_PLANES)
        ],
    )
    # single-subtree melt (explode over planes, not a per-plane union)
    # + snapshot: the density histogram and the scoring join both read
    # it (r11)
    melted = (
        binned.select(
            "vec_id",
            "n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("plane"), F.col(f"b{p}").alias("bin")
                        )
                        for p in range(ANOM_N_PLANES)
                    ]
                )
            ).alias("pb"),
        )
        .select("vec_id", "n", F.col("pb.plane").alias("plane"), F.col("pb.bin").alias("bin"))
        .transform(snapshot(eager=False))
    )
    dens = melted.groupBy("plane", "bin").agg(F.count("*").alias("c"))
    lnp = F.log(F.col("c").cast("double") / F.col("n").cast("double")).cast(
        "decimal(20,12)"
    )
    scored = melted.join(F.broadcast(dens), ["plane", "bin"]).select(
        "vec_id", lnp.alias("lnp")
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.round(
                (-F.sum("lnp")).cast("double") / ANOM_N_PLANES, 6
            ).alias("anomaly_score")
        )
        .orderBy(F.col("anomaly_score").desc(), F.col("vec_id").asc())
        .limit(ANOM_TOP_N)
    )


# ---------------------------------------------------------------------------
# mix-shift decomposition of a metric change (rate vs composition)
# ---------------------------------------------------------------------------


@register(
    "q_orders_mix_shift",
    oracle="""
        WITH cells AS (
            SELECT o_orderpriority,
                   CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' THEN 1
                        ELSE 0 END AS period,
                   COUNT(*) AS n,
                   SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT period, CAST(SUM(n) AS BIGINT) AS big_n FROM cells GROUP BY period
        ),
        wide AS (
            SELECT c.o_orderpriority,
                   CAST(MIN(CASE WHEN c.period = 0 THEN c.n END) AS BIGINT) AS n0,
                   CAST(MIN(CASE WHEN c.period = 1 THEN c.n END) AS BIGINT) AS n1,
                   CAST(MIN(CASE WHEN c.period = 0 THEN c.s END) AS DOUBLE) AS s0,
                   CAST(MIN(CASE WHEN c.period = 1 THEN c.s END) AS DOUBLE) AS s1,
                   (SELECT CAST(big_n AS DOUBLE) FROM tot WHERE period = 0) AS t0,
                   (SELECT CAST(big_n AS DOUBLE) FROM tot WHERE period = 1) AS t1
            FROM cells c GROUP BY c.o_orderpriority
        )
        SELECT o_orderpriority,
               ROUND(CAST(n0 AS DOUBLE) / t0, 6) AS w0,
               ROUND(CAST(n1 AS DOUBLE) / t1, 6) AS w1,
               ROUND(s0 / n0, 6) AS r0,
               ROUND(s1 / n1, 6) AS r1,
               ROUND((CAST(n1 AS DOUBLE) / t1) * (s1 / n1 - s0 / n0), 6)
                   AS rate_effect,
               ROUND((CAST(n1 AS DOUBLE) / t1 - CAST(n0 AS DOUBLE) / t0)
                     * (s0 / n0), 6) AS mix_effect
        FROM wide
    """,
    doc=(
        "Mix-shift (Oaxaca-style) decomposition: how much of the "
        "1996→1997 change in average order value came from each "
        "priority class spending differently (rate effect, current-mix "
        "weighted) versus the order mix shifting between classes (mix "
        "effect, base-rate weighted). The identity sum(rate_effect) + "
        "sum(mix_effect) = avg1 - avg0 is asserted in tests. All "
        "inputs are integer counts and DECIMAL-exact sums; each "
        "ratio/product rounds once. One partial-aggregable groupBy "
        "over the date-pruned scan plus two broadcast-sized totals."
    ),
    tags=("aggregate", "statistics", "reporting"),
)
def q_orders_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
    )
    period = F.when(
        F.col("o_orderdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"), 1
    ).otherwise(0)
    cells = o.groupBy("o_orderpriority", period.alias("period")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("s"),
    )
    tot = cells.groupBy("period").agg(F.sum("n").cast("bigint").alias("big_n"))
    t0 = tot.filter(F.col("period") == 0).select(
        F.col("big_n").cast("double").alias("t0")
    )
    t1 = tot.filter(F.col("period") == 1).select(
        F.col("big_n").cast("double").alias("t1")
    )
    wide = (
        cells.groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("period") == 0, F.col("n"))).alias("n0"),
            F.min(F.when(F.col("period") == 1, F.col("n"))).alias("n1"),
            F.min(F.when(F.col("period") == 0, F.col("s"))).cast("double").alias("s0"),
            F.min(F.when(F.col("period") == 1, F.col("s"))).cast("double").alias("s1"),
        )
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    w0 = F.col("n0").cast("double") / F.col("t0")
    w1 = F.col("n1").cast("double") / F.col("t1")
    r0 = F.col("s0") / F.col("n0")
    r1 = F.col("s1") / F.col("n1")
    return wide.select(
        "o_orderpriority",
        F.round(w0, 6).alias("w0"),
        F.round(w1, 6).alias("w1"),
        F.round(r0, 6).alias("r0"),
        F.round(r1, 6).alias("r1"),
        F.round(w1 * (r1 - r0), 6).alias("rate_effect"),
        F.round((w1 - w0) * r0, 6).alias("mix_effect"),
    )
