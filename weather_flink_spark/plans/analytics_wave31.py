"""Wave-31 operators (round 6, continued): rolling active users and
multi-feature OLS.

- ``q_events_dau_wau`` — DAU / WAU / stickiness: per calendar day, the
  exact count of distinct active users that day and over the trailing
  7 days. Rolling COUNT(DISTINCT) does not compose as a window
  aggregate; the scalable shape is (day, user) dedup first (one
  shuffle, corpus → activity matrix), then a BOUNDED range join (each
  activity row lands in ≤ 7 day buckets) + partial-aggregated distinct
  per day — never a 7-day self-join of raw events, never a window
  over an unbounded user set.
- ``q_stats_ols_multi`` — two-feature ordinary least squares with
  closed-form normal equations: value ~ hour-of-day + is-weekend per
  event type. The 3x3 moment matrix (X'X, X'y) accumulates in EXACT
  integer/decimal partial aggregates (hod and weekend are small ints,
  value goes through DECIMAL(18,6)), and the Cramer's-rule solve is a
  fixed double expression at the end — the distributed-normal-
  equations pattern that replaces iterative solvers for low-dimension
  regression at any scale.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# DAU / WAU / stickiness
# ---------------------------------------------------------------------------

_WAU_DAYS = 7


@register(
    "q_events_dau_wau",
    oracle=f"""
        WITH act AS (
            -- the (day, user) activity matrix: ONE dedup shuffle
            SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        ),
        days AS (SELECT DISTINCT d FROM act),
        dau AS (
            SELECT d, COUNT(*) AS dau FROM act GROUP BY d
        ),
        wau AS (
            -- bounded range join: each activity row joins <= 7 days
            SELECT dy.d, COUNT(DISTINCT a.user_id) AS wau
            FROM days dy
            JOIN act a
              ON a.d BETWEEN dy.d - {_WAU_DAYS - 1} AND dy.d
            GROUP BY dy.d
        )
        SELECT dau.d AS day, dau.dau, wau.wau,
               ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
        FROM dau JOIN wau ON wau.d = dau.d
    """,
    doc=(
        "DAU / WAU / stickiness (DAU/WAU): exact distinct active users "
        f"per day and per trailing {_WAU_DAYS} days. Rolling "
        "COUNT(DISTINCT) does not compose as a window aggregate, so "
        "the plan dedups to the (day, user) activity matrix first "
        "(one shuffle — at 100 TB this is the table a product-"
        "analytics store materializes daily), then a BOUNDED range "
        f"join (each activity row lands in <= {_WAU_DAYS} day "
        "buckets) feeds a partial-aggregated distinct per day. Never "
        "a 7-day self-join of raw events, never an unbounded window. "
        "Stickiness = DAU/WAU, the standard engagement ratio, one "
        "double division."
    ),
    tags=("analytics", "window", "distinct"),
)
def q_events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    act = e.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = act.select("d").distinct()
    dau = act.groupBy("d").agg(F.count("*").alias("dau"))
    a = act.select(F.col("d").alias("ad"), "user_id")
    wau = (
        days.join(
            a,
            F.col("ad").between(
                F.date_sub(F.col("d"), _WAU_DAYS - 1), F.col("d")
            ),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


# ---------------------------------------------------------------------------
# two-feature OLS via exact normal equations
# ---------------------------------------------------------------------------

# features: x1 = hour-of-day (0..23), x2 = weekend flag (0/1); both
# pure integer epoch arithmetic (the analytics_wave4 idiom) so every
# moment involving only features is an exact BIGINT sum, and moments
# involving y go through DECIMAL(18,6).
_HOD = "(unix_micros(ts) div 3600000000) % 24"
_WKD = "case when (unix_micros(ts) div 86400000000 + 4) % 7 in (0, 6) then 1 else 0 end"
_HOD_DUCK = "CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT)"
_WKD_DUCK = (
    "CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6)"
    " THEN 1 ELSE 0 END"
)


@register(
    "q_stats_ols_multi",
    oracle=f"""
        WITH base AS (
            SELECT event_type,
                   {_HOD_DUCK} AS x1,
                   CAST({_WKD_DUCK} AS BIGINT) AS x2,
                   CAST(value AS DECIMAL(18,6)) AS y
            FROM events
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x1) AS BIGINT) AS s1,
                   CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(x1 * x1) AS BIGINT) AS s11,
                   CAST(SUM(x1 * x2) AS BIGINT) AS s12,
                   CAST(SUM(x2 * x2) AS BIGINT) AS s22,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
                   CAST(SUM(x2 * y) AS DOUBLE) AS s2y
            FROM base GROUP BY event_type
        )
        SELECT event_type, n,
               -- Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
               -- b = (intercept, b_hod, b_weekend); detA from exact ints
               ROUND((sy * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
                      - s1y * (CAST(s1 AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s12)
                      + s2y * (CAST(s1 AS DOUBLE) * s12 - CAST(s2 AS DOUBLE) * s11))
                     / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
                        - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s12)
                        + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s2 AS DOUBLE) * s11)),
                     9) AS intercept,
               ROUND((CAST(n AS DOUBLE) * (s1y * s22 - CAST(s12 AS DOUBLE) * s2y)
                      - sy * (CAST(s1 AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s12)
                      + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s2 AS DOUBLE) * s1y))
                     / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
                        - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s12)
                        + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s2 AS DOUBLE) * s11)),
                     9) AS beta_hod,
               ROUND((CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y - s1y * CAST(s12 AS DOUBLE))
                      - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s2 AS DOUBLE) * s1y)
                      + sy * (CAST(s1 AS DOUBLE) * s12 - CAST(s2 AS DOUBLE) * s11))
                     / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
                        - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s12)
                        + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s2 AS DOUBLE) * s11)),
                     9) AS beta_weekend
        FROM m
    """,
    doc=(
        "Two-feature OLS (value ~ hour-of-day + weekend) per event "
        "type via closed-form normal equations: every X'X moment is an "
        "exact BIGINT partial aggregate (features are small integers "
        "from pure epoch arithmetic), every X'y moment an exact "
        "DECIMAL(18,6) sum surfaced as one double, and the 3x3 "
        "Cramer's-rule solve is a fixed double expression written "
        "IDENTICALLY on both engines (same parenthesization, no "
        "reassociation possible). This is the distributed-normal-"
        "equations pattern: for low-dimension regression the moment "
        "matrix is a model-sized aggregate and no iterative solver "
        "ever touches the data. Extends q_agg_linear_regression "
        "(single feature) to the multi-feature case."
    ),
    tags=("stats", "regression", "ml-pipeline"),
)
def q_stats_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.expr(_HOD).cast("bigint").alias("x1"),
        F.expr(_WKD).cast("bigint").alias("x2"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    )
    m = base.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s11 = F.col("s11").cast("double")
    s12 = F.col("s12").cast("double")
    s22 = F.col("s22").cast("double")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    det = (
        n * (s11 * s22 - s12 * F.col("s12").cast("double"))
        - s1 * (s1 * s22 - s2 * s12)
        + s2 * (s1 * s12 - s2 * s11)
    )
    b0 = (
        sy * (s11 * s22 - s12 * F.col("s12").cast("double"))
        - s1y * (s1 * s22 - s2 * s12)
        + s2y * (s1 * s12 - s2 * s11)
    ) / det
    b1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s2 * s12)
        + s2 * (s1 * s2y - s2 * s1y)
    ) / det
    b2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s2 * s1y)
        + sy * (s1 * s12 - s2 * s11)
    ) / det
    return m.select(
        "event_type",
        "n",
        F.round(b0, 9).alias("intercept"),
        F.round(b1, 9).alias("beta_hod"),
        F.round(b2, 9).alias("beta_weekend"),
    )


# ---------------------------------------------------------------------------
# t-closeness (1-D EMD over the ordered sensitive bands)
# ---------------------------------------------------------------------------

_TC_T = 0.2  # closeness threshold


@register(
    "q_privacy_t_closeness",
    oracle=f"""
        WITH c AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(FLOOR(c_acctbal / 1000.0) AS INT) AS band
            FROM customer
        ),
        gdist AS (
            SELECT band, CAST(COUNT(*) AS BIGINT) AS cb FROM c GROUP BY band
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
        grp AS (
            SELECT c_nationkey, c_mktsegment, band,
                   CAST(COUNT(*) AS BIGINT) AS cgb
            FROM c GROUP BY 1, 2, 3
        ),
        gsize AS (
            SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS ng
            FROM c GROUP BY 1, 2
        ),
        grid AS (
            -- dense (group x global band) grid: absent bands count 0
            SELECT gs.c_nationkey, gs.c_mktsegment, gs.ng, gl.band, gl.cb,
                   COALESCE(gr.cgb, 0) AS cgb
            FROM gsize gs
            CROSS JOIN gdist gl
            LEFT JOIN grp gr
              ON gr.c_nationkey = gs.c_nationkey
             AND gr.c_mktsegment = gs.c_mktsegment
             AND gr.band = gl.band
        ),
        cum AS (
            -- (Q_g - P) numerator over the common denominator ng*N is
            -- EXACT BIGINT: cgb*N - cb*ng; EMD = sum |cumsum| / (ng*N)
            SELECT c_nationkey, c_mktsegment, ng,
                   SUM(cgb * t.n - cb * ng) OVER (
                       PARTITION BY c_nationkey, c_mktsegment
                       ORDER BY band
                       ROWS UNBOUNDED PRECEDING) AS cum_num,
                   t.n
            FROM grid CROSS JOIN tot t
        )
        SELECT c_nationkey, c_mktsegment, ng AS group_size,
               ROUND(CAST(SUM(ABS(cum_num)) AS DOUBLE) / (ng * n), 9)
                   AS t_emd,
               CAST(SUM(ABS(cum_num)) AS DOUBLE) / (ng * n) <= {_TC_T}
                   AS t_ok
        FROM cum
        GROUP BY c_nationkey, c_mktsegment, ng, n
    """,
    doc=(
        "t-closeness audit (Li et al. 2007 — completes the privacy "
        "trio with q_privacy_k_anonymity and q_privacy_l_diversity): "
        "per (nation, mktsegment) QI group, the 1-D earth-mover's "
        "distance between the group's sensitive-band distribution and "
        "the global one. EXACT arithmetic throughout: the per-band "
        "(Q_g - P) difference over the common denominator ng*N has "
        "BIGINT numerator cgb*N - cb*ng, the ordered-band cumulative "
        "sum stays integer (partitioned window), and EMD = sum of "
        "|cumulative| with ONE double division at the end — no float "
        "drift possible before the final op. Scale: two partial-"
        "aggregated groupBys + a model-sized (groups x bands) grid; "
        f"t_ok flags groups within t = {_TC_T}."
    ),
    tags=("privacy", "aggregate", "distribution"),
)
def q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("band"),
    )
    glob = cust.groupBy("band").agg(F.count("*").cast("bigint").alias("cb"))
    tot = cust.agg(F.count("*").cast("bigint").alias("n"))
    grp = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count("*").cast("bigint").alias("cgb")
    )
    gsize = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("bigint").alias("ng")
    )
    grid = (
        gsize.crossJoin(F.broadcast(glob))
        .join(grp, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "ng",
            "band",
            "cb",
            F.coalesce(F.col("cgb"), F.lit(0).cast("bigint")).alias("cgb"),
        )
        .crossJoin(F.broadcast(tot))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "ng",
        "n",
        F.sum(F.col("cgb") * F.col("n") - F.col("cb") * F.col("ng"))
        .over(w)
        .alias("cum_num"),
    )
    emd = F.sum(F.abs(F.col("cum_num"))).cast("double") / (
        F.col("ng") * F.col("n")
    )
    return cum.groupBy("c_nationkey", "c_mktsegment", "ng", "n").agg(
        F.round(emd, 9).alias("t_emd"),
        (emd <= _TC_T).alias("t_ok"),
    ).select(
        "c_nationkey",
        "c_mktsegment",
        F.col("ng").alias("group_size"),
        "t_emd",
        "t_ok",
    )
