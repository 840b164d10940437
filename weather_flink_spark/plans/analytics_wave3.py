"""Wave-3 analytics operators: statistical modelling, sequence/session
analytics, market-basket mining, ranking, and training-data packing.

All ten queries are pure declarative DataFrame plans (no UDFs, no
driver loops): Catalyst sees joins/windows/aggregates it can push down,
reorder, and whole-stage-codegen.  Float parity with the DuckDB oracle
follows the repo-wide discipline (functions/numeric.py): exact DECIMAL
moments surfaced as DOUBLE, identical scalar expression shapes on both
sides, and no order-dependent double summation anywhere.

Scale notes (100 TB):
- regression / t-test / BM25 stats reduce to one groupBy each with
  map-side partial aggregation; the tiny stat rows broadcast back.
- gaps-islands / Markov / CUSUM shuffle once on the entity key and run
  as window functions inside the sort the shuffle already paid for.
- basket pairs are quadratic in basket size, not in table size; the
  per-item dimension (|parts|) broadcasts, and AQE skew-join handles a
  hot basket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.operators.global_order import attach_global_ntile
from weather_flink_spark.plans.registry import register
from weather_flink_spark.plans.llm_pipeline import tokens_col

# ---------------------------------------------------------------------------
# closed-form OLS per group
# ---------------------------------------------------------------------------


@register(
    "q_agg_linear_regression",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))
                          * CAST(l_extendedprice AS DECIMAL(16,6))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))
                          * CAST(l_quantity AS DECIMAL(12,6))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))
                          * CAST(l_extendedprice AS DECIMAL(16,6))) AS DOUBLE) AS syy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
               ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 6) AS intercept,
               ROUND(((CAST(n AS DOUBLE) * sxy - sx * sy)
                 * (CAST(n AS DOUBLE) * sxy - sx * sy))
                 / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                 * (CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS r2
        FROM m
    """,
    doc=(
        "Closed-form per-group OLS (extendedprice ~ quantity per "
        "returnflag) from five exact DECIMAL moments — the regr_slope/"
        "regr_intercept/regr_r2 surface, but order-independent: one "
        "groupBy with map-side partial aggregation, then scalar double "
        "arithmetic on the tiny moment rows.  No second pass over the "
        "data, no residual materialization.  Outputs are rounded (6/9 "
        "dp): the second moments' scaled integers exceed 2^53, where "
        "DuckDB's two-step decimal→double cast can differ from Spark's "
        "single-rounded BigDecimal cast by an ulp."
    ),
    tags=("aggregate", "statistics"),
)
def q_agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    xd = F.col("l_quantity").cast("decimal(12,6)")
    yd = F.col("l_extendedprice").cast("decimal(16,6)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / den_x
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 6).alias("intercept"),
        F.round((num * num) / (den_x * den_y), 9).alias("r2"),
    )


# ---------------------------------------------------------------------------
# gaps-and-islands session merge
# ---------------------------------------------------------------------------


@register(
    "q_events_gaps_islands",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 300000000
                        THEN 1 ELSE 0 END AS new_island
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        numbered AS (
            SELECT user_id, ts,
                   CAST(SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS island
            FROM flagged
        )
        SELECT user_id, island,
               MIN(ts) AS island_start, MAX(ts) AS island_end,
               COUNT(*) AS n_events,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us
        FROM numbered GROUP BY user_id, island
    """,
    doc=(
        "Gaps-and-islands: merge each user's event stream into activity "
        "islands separated by >5-minute silences — lag + flag + running "
        "sum, the canonical interval-merge without self-joins.  One "
        "shuffle on user_id; both windows and the final groupBy reuse "
        "that same partitioning and sort (one Exchange in the plan).  "
        "Gap timing in exact integer microseconds (unix_micros =="
        " DuckDB epoch_us), no DATE_DIFF boundary semantics involved."
    ),
    tags=("window", "timeseries", "sessionization"),
)
def q_events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_us = F.unix_micros(F.lag("ts").over(w))
    new_island = (
        F.when(prev_us.isNull() | (F.unix_micros("ts") - prev_us > 300_000_000), 1)
        .otherwise(0)
        .alias("new_island")
    )
    numbered = e.select("user_id", "ts", "event_id", new_island).select(
        "user_id",
        "ts",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
    )
    return numbered.groupBy("user_id", "island").agg(
        F.min("ts").alias("island_start"),
        F.max("ts").alias("island_end"),
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over event sequences
# ---------------------------------------------------------------------------


@register(
    "q_events_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type, COUNT(*) AS n_transitions,
               CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS prob
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
    doc=(
        "First-order Markov transition matrix over per-user event-type "
        "sequences: lag window for the predecessor, groupBy for counts, "
        "a frameless window for the row-normalized transition "
        "probability.  prob is one bigint/bigint divide — exact on both "
        "engines.  The |types|^2 output is tiny at any input scale; the "
        "only data-sized cost is the single user_id shuffle."
    ),
    tags=("window", "sequence", "statistics"),
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "event_type").agg(F.count("*").alias("n_transitions"))
    total = F.sum("n_transitions").over(Window.partitionBy("prev_type"))
    return counts.select(
        "prev_type",
        "event_type",
        "n_transitions",
        (F.col("n_transitions").cast("double") / total).alias("prob"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


@register(
    "q_customer_rfm",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey,
                   (epoch_us((SELECT MAX(o_orderdate) FROM orders))
                      - epoch_us(last_order)) // 86400000000 AS recency_days,
                   frequency, monetary,
                   NTILE(4) OVER (ORDER BY epoch_us(last_order) DESC, o_custkey ASC) AS r_score,
                   NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
                   NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_score
            FROM per_cust
        )
        SELECT o_custkey, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               CONCAT(CAST(r_score AS VARCHAR), CAST(f_score AS VARCHAR),
                      CAST(m_score AS VARCHAR)) AS rfm
        FROM scored
    """,
    doc=(
        "RFM segmentation: per-customer recency (exact integer day "
        "diff vs the global max order date, via a scalar-agg broadcast), "
        "frequency, decimal-exact monetary, each quartiled with NTILE "
        "over a total order (custkey tie-break makes the quartile "
        "assignment deterministic on both engines). The three NTILEs "
        "run DISTRIBUTED via operators.global_order.attach_global_ntile "
        "(range-partitioned rank + closed-form bucket from rank and N) — "
        "no partitionless WindowExec anywhere in the plan, so the scored "
        "table can be |customers| ~ 1e9 rows without a single-task sort."
    ),
    tags=("window", "analytics", "segmentation"),
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("monetary"),
    )
    gmax = o.agg(F.max("o_orderdate").alias("gmax"))
    joined = per_cust.join(F.broadcast(gmax))
    base = joined.select(
        "o_custkey",
        F.expr(
            "(unix_micros(cast(gmax as timestamp))"
            " - unix_micros(cast(last_order as timestamp))) div 86400000000"
        ).alias("recency_days"),
        F.unix_micros(F.col("last_order").cast("timestamp")).alias("last_us"),
        "frequency",
        "monetary",
    )
    scored = attach_global_ntile(
        base, 4, [F.col("last_us").desc(), F.col("o_custkey").asc()], "r_score"
    )
    scored = attach_global_ntile(
        scored, 4, [F.col("frequency").desc(), F.col("o_custkey").asc()], "f_score"
    )
    scored = attach_global_ntile(
        scored, 4, [F.col("monetary").desc(), F.col("o_custkey").asc()], "m_score"
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm"),
    )


# ---------------------------------------------------------------------------
# market-basket pair mining (support / confidence / lift)
# ---------------------------------------------------------------------------


@register(
    "q_basket_pairs_lift",
    oracle="""
        WITH basket AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        n_ord AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM basket),
        item AS (SELECT l_partkey, COUNT(*) AS c FROM basket GROUP BY l_partkey),
        pair AS (
            SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_pair
            FROM basket a JOIN basket b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
        )
        SELECT p1, p2, n_pair,
               CAST(n_pair AS DOUBLE) / CAST(n.n AS DOUBLE) AS support,
               CAST(n_pair AS DOUBLE) / CAST(i1.c AS DOUBLE) AS confidence,
               (CAST(n_pair AS DOUBLE) * CAST(n.n AS DOUBLE))
                 / (CAST(i1.c AS DOUBLE) * CAST(i2.c AS DOUBLE)) AS lift
        FROM pair
        JOIN item i1 ON i1.l_partkey = p1
        JOIN item i2 ON i2.l_partkey = p2
        CROSS JOIN n_ord n
        WHERE n_pair >= 5
    """,
    doc=(
        "Market-basket pair mining: distinct (order, part) baskets, "
        "self-joined on the order key with p1<p2 to enumerate "
        "co-occurring pairs, then support / confidence / lift from pure "
        "bigint counts (each ratio one IEEE divide — exact parity).  "
        "The pair join is co-partitioned on l_orderkey (one shuffle, "
        "sort-merge against itself); item counts and the order total "
        "are broadcast.  Cost is quadratic in basket size, not table "
        "size — a hot mega-basket is AQE skew-join territory."
    ),
    tags=("join", "analytics", "mining"),
)
def q_basket_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import order_part_edges_table

    basket = order_part_edges_table(spark, sf_dir)
    n_ord = basket.agg(F.countDistinct("l_orderkey").alias("n"))
    item = basket.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a = basket.alias("a")
    b = basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    out = (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .join(F.broadcast(n_ord))
    )
    npd = F.col("n_pair").cast("double")
    nd = F.col("n").cast("double")
    return out.select(
        "p1",
        "p2",
        "n_pair",
        (npd / nd).alias("support"),
        (npd / F.col("c1").cast("double")).alias("confidence"),
        ((npd * nd) / (F.col("c1").cast("double") * F.col("c2").cast("double"))).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Welch two-sample t-test per group
# ---------------------------------------------------------------------------


@register(
    "q_stats_welch_ttest",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN isodow(ts) - 1 < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN isodow(ts) - 1 >= 5
                        THEN CAST(value AS DECIMAL(14,6)) END) AS DOUBLE) AS sx1,
                   CAST(SUM(CASE WHEN isodow(ts) - 1 < 5
                        THEN CAST(value AS DECIMAL(14,6)) END) AS DOUBLE) AS sx0,
                   CAST(SUM(CASE WHEN isodow(ts) - 1 >= 5
                        THEN CAST(value AS DECIMAL(14,6)) * CAST(value AS DECIMAL(14,6))
                        END) AS DOUBLE) AS sxx1,
                   CAST(SUM(CASE WHEN isodow(ts) - 1 < 5
                        THEN CAST(value AS DECIMAL(14,6)) * CAST(value AS DECIMAL(14,6))
                        END) AS DOUBLE) AS sxx0
            FROM events GROUP BY event_type
        ),
        s AS (
            SELECT event_type, n1, n0,
                   sx1 / CAST(n1 AS DOUBLE) AS m1,
                   sx0 / CAST(n0 AS DOUBLE) AS m0,
                   ROUND((sxx1 - sx1 * sx1 / CAST(n1 AS DOUBLE))
                         / (CAST(n1 AS DOUBLE) - 1.0), 6) AS v1,
                   ROUND((sxx0 - sx0 * sx0 / CAST(n0 AS DOUBLE))
                         / (CAST(n0 AS DOUBLE) - 1.0), 6) AS v0
            FROM m
        )
        SELECT event_type, n1, n0, m1, m0, v1, v0,
               (m1 - m0) / SQRT(v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE)) AS t_stat,
               ((v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE))
                 * (v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE)))
                 / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) - 1.0)
                    + (v0 / CAST(n0 AS DOUBLE)) * (v0 / CAST(n0 AS DOUBLE))
                      / (CAST(n0 AS DOUBLE) - 1.0)) AS welch_df
        FROM s
    """,
    doc=(
        "Welch two-sample t-test per event_type (weekend vs weekday "
        "values): both samples' count / mean / variance come from ONE "
        "conditional-aggregation pass (no second scan, no join), with "
        "exact DECIMAL first and second moments; t-statistic and "
        "Welch-Satterthwaite df are scalar double arithmetic using only "
        "mul/div/sqrt (pow is avoided — it differs between engines).  "
        "Variances are rounded to 6 dp at definition (the second "
        "moment's scaled integer exceeds 2^53, where the engines' "
        "decimal→double casts can split an ulp) so the downstream "
        "t/df arithmetic starts from identical doubles.  Weekday "
        "parity: Spark weekday() == DuckDB isodow()-1."
    ),
    tags=("aggregate", "statistics"),
)
def q_stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wk = F.weekday("ts") >= 5
    vd = F.col("value").cast("decimal(14,6)")
    m = e.groupBy("event_type").agg(
        F.sum(F.when(wk, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~wk, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(wk, vd)).cast("double").alias("sx1"),
        F.sum(F.when(~wk, vd)).cast("double").alias("sx0"),
        F.sum(F.when(wk, vd * vd)).cast("double").alias("sxx1"),
        F.sum(F.when(~wk, vd * vd)).cast("double").alias("sxx0"),
    )
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    s = m.select(
        "event_type",
        "n1",
        "n0",
        (F.col("sx1") / n1d).alias("m1"),
        (F.col("sx0") / n0d).alias("m0"),
        F.round(
            (F.col("sxx1") - F.col("sx1") * F.col("sx1") / n1d) / (n1d - F.lit(1.0)), 6
        ).alias("v1"),
        F.round(
            (F.col("sxx0") - F.col("sx0") * F.col("sx0") / n0d) / (n0d - F.lit(1.0)), 6
        ).alias("v0"),
    )
    se1 = F.col("v1") / F.col("n1").cast("double")
    se0 = F.col("v0") / F.col("n0").cast("double")
    return s.select(
        "event_type",
        "n1",
        "n0",
        "m1",
        "m0",
        "v1",
        "v0",
        ((F.col("m1") - F.col("m0")) / F.sqrt(se1 + se0)).alias("t_stat"),
        (
            ((se1 + se0) * (se1 + se0))
            / (
                se1 * se1 / (F.col("n1").cast("double") - F.lit(1.0))
                + se0 * se0 / (F.col("n0").cast("double") - F.lit(1.0))
            )
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# CUSUM change detection (closed form, no recursion)
# ---------------------------------------------------------------------------


@register(
    "q_events_cusum",
    oracle="""
        WITH pref AS (
            SELECT user_id, event_id, ts, value,
                   CAST(SUM(CAST(value AS DECIMAL(14,6)) - CAST(55 AS DECIMAL(14,6))) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS DECIMAL(18,6)) AS p
            FROM events
        ),
        runs AS (
            SELECT user_id, event_id, ts, value, p,
                   MIN(p) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS runmin,
                   MAX(p) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS runmax
            FROM pref
        ),
        clamped AS (
            SELECT user_id, event_id, ts, value, p,
                   CASE WHEN runmin < 0 THEN runmin
                        ELSE CAST(0 AS DECIMAL(18,6)) END AS floor_p,
                   CASE WHEN runmax > 0 THEN runmax
                        ELSE CAST(0 AS DECIMAL(18,6)) END AS ceil_p
            FROM runs
        )
        SELECT user_id, event_id, ts, value,
               CAST(p - floor_p AS DOUBLE) AS cusum_pos,
               CAST(ceil_p - p AS DOUBLE) AS cusum_neg,
               CAST(p - floor_p AS DOUBLE) > 500.0 AS alarm_high,
               CAST(ceil_p - p AS DOUBLE) > 500.0 AS alarm_low
        FROM clamped
    """,
    doc=(
        "Two-sided CUSUM change detection per user against target 55.  "
        "The textbook recursion S_t = max(0, S_{t-1} + d_t) is "
        "inexpressible as a SQL window — but it has the exact closed "
        "form S_t = P_t - min(0, min_{j<=t} P_j) over the deviation "
        "prefix sums, so the whole detector is three stacked windows on "
        "one user_id shuffle/sort: running DECIMAL prefix sum, running "
        "min, running max.  No applyInPandas, no fold, scales linearly. "
        "Parity traps handled: the clamp is CASE WHEN, not LEAST/"
        "GREATEST (DuckDB's LEAST on decimals silently promotes to "
        "DOUBLE), and every intermediate stays within DECIMAL(18,6) so "
        "neither engine's subtraction overflows precision into floats."
    ),
    tags=("window", "timeseries", "anomaly"),
)
def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = F.col("value").cast("decimal(14,6)") - F.lit(55).cast("decimal(14,6)")
    pref = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(d).over(w).cast("decimal(18,6)").alias("p"),
    )
    runs = pref.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "p",
        F.min("p").over(w).alias("runmin"),
        F.max("p").over(w).alias("runmax"),
    )
    zero = F.lit(0).cast("decimal(18,6)")
    floor_p = F.when(F.col("runmin") < 0, F.col("runmin")).otherwise(zero)
    ceil_p = F.when(F.col("runmax") > 0, F.col("runmax")).otherwise(zero)
    pos = (F.col("p") - floor_p).cast("double")
    neg = (ceil_p - F.col("p")).cast("double")
    return runs.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        pos.alias("cusum_pos"),
        neg.alias("cusum_neg"),
        (pos > 500.0).alias("alarm_high"),
        (neg > 500.0).alias("alarm_low"),
    )


# ---------------------------------------------------------------------------
# BM25 ranking over the documents corpus
# ---------------------------------------------------------------------------

BM25_TERMS = ("spark", "join", "scan")


def _bm25_oracle() -> str:
    tf_cols = ",\n                   ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ",\n                   ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    score_terms = " + ".join(
        f"(ln((CAST(s.n AS DOUBLE) - CAST(s.df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(s.df{i} AS DOUBLE) + 0.5) + 1.0)"
        f" * (CAST(tf{i} AS DOUBLE) * 2.2)"
        f" / (CAST(tf{i} AS DOUBLE) + 1.2 * (0.25 + 0.75"
        f" * (CAST(dl AS DOUBLE) / (CAST(s.sdl AS DOUBLE) / CAST(s.n AS DOUBLE))))))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
        WITH d AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS dl,
                   {tf_cols}
            FROM documents
        ),
        stats AS (
            SELECT COUNT(*) AS n, SUM(dl) AS sdl,
                   {df_cols}
            FROM d
        )
        SELECT doc_id, dl, tf0, tf1, tf2,
               ROUND({score_terms}, 6) AS bm25
        FROM d CROSS JOIN stats s
        WHERE tf0 + tf1 + tf2 > 0
    """


@register(
    "q_text_bm25",
    oracle=_bm25_oracle(),
    doc=(
        "BM25 ranking (k1=1.2, b=0.75) of the documents corpus for a "
        "fixed 3-term query, fully columnar: per-doc term frequencies "
        "via array filter on the token split (no explode), corpus N / "
        "avgdl / per-term document frequencies in ONE tiny aggregate "
        "row that cross-join-broadcasts back.  The 3-term score is a "
        "fixed-order sum of scalar expressions — no order-dependent "
        "double aggregation.  pow() is avoided (JVM/libm last-ulp "
        "divergence) and the score is rounded to 6 dp because ln() "
        "itself drifts an ulp on rare inputs."
    ),
    tags=("text", "ranking", "search"),
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = tokens_col()
    # single-arg lambda factory: a two-arg lambda (e.g. default-bound
    # ``t=t``) would make F.filter pass the ELEMENT INDEX as the second
    # argument, silently comparing tokens against integers.
    def term_eq(term: str):
        return lambda x: x == F.lit(term)

    sel = [F.col("doc_id"), F.size(tok).cast("bigint").alias("dl")]
    for i, t in enumerate(BM25_TERMS):
        sel.append(F.size(F.filter(tok, term_eq(t))).cast("bigint").alias(f"tf{i}"))
    docs = d.select(*sel)
    aggs = [F.count("*").alias("n"), F.sum("dl").alias("sdl")]
    for i in range(len(BM25_TERMS)):
        aggs.append(F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}"))
    stats = docs.agg(*aggs)
    joined = docs.join(F.broadcast(stats))
    nd = F.col("n").cast("double")
    avgdl = F.col("sdl").cast("double") / nd
    score = None
    for i in range(len(BM25_TERMS)):
        tfd = F.col(f"tf{i}").cast("double")
        dfd = F.col(f"df{i}").cast("double")
        idf = F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
        part = (idf * (tfd * F.lit(2.2))) / (
            tfd + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / avgdl))
        )
        score = part if score is None else score + part
    return joined.filter(F.col("tf0") + F.col("tf1") + F.col("tf2") > 0).select(
        "doc_id", "dl", "tf0", "tf1", "tf2", F.round(score, 6).alias("bm25")
    )


# ---------------------------------------------------------------------------
# PII redaction (regex scrub pass)
# ---------------------------------------------------------------------------

EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{4}"


@register(
    "q_text_pii_redact",
    oracle=f"""
        WITH enriched AS (
            SELECT doc_id,
                   CONCAT('user', CAST(doc_id AS VARCHAR), '@', source,
                          '.org call 555-',
                          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                          ' ', text) AS contact
            FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(contact, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(contact, '{PHONE_RE}')) AS n_phones,
               regexp_replace(regexp_replace(contact, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM enriched
    """,
    doc=(
        "PII scrub pass for a training corpus: deterministic synthetic "
        "contact strings (the corpus itself is PII-free) run through "
        "email and phone regex redaction with per-doc match counts.  "
        "Patterns use only character classes and bounded quantifiers — "
        "the Java-regex/RE2 common subset, identical semantics in both "
        "engines; Spark regexp_replace is global by default, DuckDB "
        "needs the explicit 'g' flag.  Pure codegen'd string "
        "expressions, embarrassingly parallel, no shuffle at all."
    ),
    tags=("text", "pipeline", "regex"),
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    contact = F.concat(
        F.lit("user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".org call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" "),
        F.col("text"),
    )
    enriched = d.select("doc_id", contact.alias("contact"))
    return enriched.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(contact, '{EMAIL_RE}', 0)"))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(contact, '{PHONE_RE}', 0)"))
        .cast("bigint")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("contact", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk) for LM pretraining
# ---------------------------------------------------------------------------

CTX = 1024  # tokens per packed training sequence


@register(
    "q_pack_concat_chunks",
    oracle=f"""
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ),
        placed AS (
            SELECT source, doc_id, n_tok,
                   SUM(n_tok) OVER (
                       PARTITION BY source ORDER BY doc_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM toks
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(MAX(cum) AS BIGINT) AS total_tokens,
               CAST((MAX(cum) + {CTX - 1}) // {CTX} AS BIGINT) AS n_bins,
               CAST(SUM(CASE WHEN (cum - n_tok) // {CTX} != (cum - 1) // {CTX}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
               CAST(MAX(cum) AS DOUBLE)
                 / (CAST((MAX(cum) + {CTX - 1}) // {CTX} AS DOUBLE) * {CTX}.0)
                 AS fill_rate
        FROM placed GROUP BY source
    """,
    doc=(
        f"Sequence packing for LM pretraining, concat-and-chunk "
        f"strategy: per source shard, documents are laid end-to-end in "
        f"doc_id order and cut into {CTX}-token training sequences; "
        f"each doc's bin span falls out of an integer prefix sum "
        f"(start // {CTX} vs end // {CTX}), giving bin count, straddler "
        f"count (docs crossing a cut), and fill rate per shard — all "
        f"exact integer arithmetic.  One shuffle on the shard key; the "
        f"running sum rides the shuffle's sort.  This is the packing "
        f"layout GPT-style pretraining uses (docs concatenated, fixed "
        f"windows), as opposed to first-fit bin packing."
    ),
    tags=("pipeline", "tokens", "packing"),
)
def q_pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id", F.size(tokens_col()).cast("bigint").alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    placed = toks.select(
        "source", "doc_id", "n_tok", F.sum("n_tok").over(w).alias("cum")
    )
    straddle = F.expr(f"(cum - n_tok) div {CTX}") != F.expr(f"(cum - 1) div {CTX}")
    return placed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.max("cum").alias("total_tokens"),
        F.expr(f"(max(cum) + {CTX - 1}) div {CTX}").alias("n_bins"),
        F.sum(F.when(straddle, 1).otherwise(0)).alias("n_straddlers"),
        (
            F.max("cum").cast("double")
            / (F.expr(f"(max(cum) + {CTX - 1}) div {CTX}").cast("double") * F.lit(float(CTX)))
        ).alias("fill_rate"),
    )
