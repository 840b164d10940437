"""Wave-35 operators (round 6, continued): difference-in-differences
and winsorized robust statistics.

- ``q_stats_did`` — difference-in-differences (the panel-data causal
  workhorse): deterministic seeded-md5 treatment assignment over
  users, pre/post split at the observation-window midpoint, and the
  DiD estimate (Δtreated − Δcontrol) with its large-sample SE from
  the four cell variances — the quasi-experimental complement to the
  randomized q_stats_welch_ttest / q_stats_cuped family (DiD is what
  you run when you could NOT randomize).
- ``q_quality_winsorize`` — winsorized robust statistics per event
  type: exact DISCRETE p1/p99 order statistics (the
  q_agg_percentile_disc rank-selection pattern — an actual observed
  value, deterministic on both engines), values clipped to that band,
  clipped-row accounting, and raw-vs-winsorized means — the standard
  heavy-tail mitigation every metrics pipeline applies before
  averaging.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# difference-in-differences
# ---------------------------------------------------------------------------

_DID_SPLIT = "2024-01-16 00:00:00"  # midpoint of the 30-day event window

_DID_TREAT_SPARK = (
    "pmod(cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)"
    " as bigint), 2)"
)
_DID_TREAT_DUCK = (
    "CAST('0x' || md5(CAST(user_id AS VARCHAR))[1:15] AS BIGINT) % 2"
)


@register(
    "q_stats_did",
    oracle=f"""
        WITH base AS (
            SELECT {_DID_TREAT_DUCK} AS treated,
                   CASE WHEN ts >= TIMESTAMP '{_DID_SPLIT}'
                        THEN 1 ELSE 0 END AS post,
                   CAST(value AS DECIMAL(14,6)) AS y
            FROM events
        ),
        cells AS (
            SELECT treated, post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(y) AS s, SUM(y * y) AS ss
            FROM base GROUP BY treated, post
        ),
        piv AS (
            SELECT
                {", ".join(
                    f"MAX(CASE WHEN treated = {t} AND post = {p} THEN n END) AS n{t}{p},"
                    f" MAX(CASE WHEN treated = {t} AND post = {p} THEN s END) AS s{t}{p},"
                    f" MAX(CASE WHEN treated = {t} AND post = {p} THEN ss END) AS ss{t}{p}"
                    for t in (0, 1) for p in (0, 1)
                )}
            FROM cells
        ),
        m AS (
            SELECT n00, n01, n10, n11,
                   {", ".join(
                       f"ROUND(CAST(s{t}{p} AS DOUBLE) / n{t}{p}, 6) AS m{t}{p},"
                       f" ROUND((CAST(ss{t}{p} AS DOUBLE)"
                       f" - CAST(s{t}{p} AS DOUBLE) * CAST(s{t}{p} AS DOUBLE) / n{t}{p})"
                       f" / (n{t}{p} - 1.0), 6) AS v{t}{p}"
                       for t in (0, 1) for p in (0, 1)
                   )}
            FROM piv
        )
        SELECT n00, n01, n10, n11, m00, m01, m10, m11,
               ROUND((m11 - m10) - (m01 - m00), 6) AS did,
               ROUND(SQRT(v11 / n11 + v10 / n10 + v01 / n01 + v00 / n00), 6)
                   AS se,
               ROUND(((m11 - m10) - (m01 - m00))
                     / SQRT(v11 / n11 + v10 / n10 + v01 / n01 + v00 / n00),
                     6) AS z,
               ABS(((m11 - m10) - (m01 - m00))
                   / SQRT(v11 / n11 + v10 / n10 + v01 / n01 + v00 / n00))
                   > 1.96 AS significant
        FROM m
    """,
    doc=(
        "Difference-in-differences: deterministic seeded-md5 treatment "
        "over users (never rand() — the q_stats_srm discipline), "
        "pre/post split at the window midpoint, DiD = (Δtreated − "
        "Δcontrol) with the large-sample SE from the four cell "
        "variances and a z gate at 1.96 — the quasi-experimental "
        "causal estimate for when randomization wasn't possible, "
        "complementing the randomized welch/CUPED family. Parity: "
        "cell moments are exact DECIMAL sums pivoted onto one row; "
        "means/variances take ONE rounding each (the BH z "
        "construction); everything after is a fixed double expression "
        "identical on both engines. Scale: one conditional-aggregation "
        "pass over events, then 4-cell math."
    ),
    tags=("stats", "causal", "ab-testing"),
)
def q_stats_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    base = e.select(
        F.expr(_DID_TREAT_SPARK).alias("treated"),
        F.when(F.col("ts") >= F.lit(_DID_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("post"),
        F.col("value").cast("decimal(14,6)").alias("y"),
    )
    cells = base.groupBy("treated", "post").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )
    piv = cells.agg(
        *[
            agg
            for t in (0, 1)
            for p in (0, 1)
            for agg in (
                F.max(
                    F.when(
                        (F.col("treated") == t) & (F.col("post") == p),
                        F.col("n"),
                    )
                ).alias(f"n{t}{p}"),
                F.max(
                    F.when(
                        (F.col("treated") == t) & (F.col("post") == p),
                        F.col("s"),
                    )
                ).alias(f"s{t}{p}"),
                F.max(
                    F.when(
                        (F.col("treated") == t) & (F.col("post") == p),
                        F.col("ss"),
                    )
                ).alias(f"ss{t}{p}"),
            )
        ]
    )
    mcols = []
    for t in (0, 1):
        for p in (0, 1):
            n = F.col(f"n{t}{p}")
            s = F.col(f"s{t}{p}").cast("double")
            ss = F.col(f"ss{t}{p}").cast("double")
            mcols.append(F.round(s / n, 6).alias(f"m{t}{p}"))
            mcols.append(
                F.round((ss - s * s / n) / (n - F.lit(1.0)), 6).alias(
                    f"v{t}{p}"
                )
            )
    m = piv.select("n00", "n01", "n10", "n11", *mcols)
    did = (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
    se = F.sqrt(
        F.col("v11") / F.col("n11")
        + F.col("v10") / F.col("n10")
        + F.col("v01") / F.col("n01")
        + F.col("v00") / F.col("n00")
    )
    return m.select(
        "n00",
        "n01",
        "n10",
        "n11",
        "m00",
        "m01",
        "m10",
        "m11",
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 6).alias("z"),
        (F.abs(did / se) > 1.96).alias("significant"),
    )


# ---------------------------------------------------------------------------
# winsorized robust statistics
# ---------------------------------------------------------------------------

_WZ_LO = 1  # percentile
_WZ_HI = 99


@register(
    "q_quality_winsorize",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, event_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        bounds AS (
            SELECT event_type, MAX(n) AS n,
                   MIN(CASE WHEN rn = CAST(CEIL(n * {_WZ_LO} / 100.0)
                                           AS BIGINT)
                            THEN value END) AS lo,
                   MIN(CASE WHEN rn = CAST(CEIL(n * {_WZ_HI} / 100.0)
                                           AS BIGINT)
                            THEN value END) AS hi
            FROM ranked GROUP BY event_type
        ),
        w AS (
            SELECT e.event_type, b.n, b.lo, b.hi,
                   CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS clip_lo,
                   CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS clip_hi,
                   CAST(e.value AS DECIMAL(14,6)) AS y,
                   CAST(CASE WHEN e.value < b.lo THEN b.lo
                             WHEN e.value > b.hi THEN b.hi
                             ELSE e.value END AS DECIMAL(14,6)) AS yw
            FROM events e JOIN bounds b ON b.event_type = e.event_type
        )
        SELECT event_type, MAX(n) AS n, MAX(lo) AS p{_WZ_LO}_lo,
               MAX(hi) AS p{_WZ_HI}_hi,
               CAST(SUM(clip_lo) AS BIGINT) AS n_clipped_low,
               CAST(SUM(clip_hi) AS BIGINT) AS n_clipped_high,
               ROUND(CAST(SUM(y) AS DOUBLE) / MAX(n), 6) AS mean_raw,
               ROUND(CAST(SUM(yw) AS DOUBLE) / MAX(n), 6) AS mean_winsor
        FROM w GROUP BY event_type
    """,
    doc=(
        f"Winsorized robust statistics per event type: exact DISCRETE "
        f"p{_WZ_LO}/p{_WZ_HI} order statistics via the "
        "q_agg_percentile_disc rank-selection pattern (an actual "
        "observed value with an event_id tie-break — identical row on "
        "both engines, never an interpolation), values clipped to the "
        "band, clipped-row accounting, and raw vs winsorized means "
        "from exact DECIMAL sums — the standard heavy-tail mitigation "
        "metrics pipelines apply before averaging (CUPED and the mean "
        "tests upstream assume it). Scale: one keyed window for the "
        "bounds (event_type-partitioned), one broadcast-bounds join, "
        "one aggregation pass."
    ),
    tags=("quality", "stats", "robust"),
)
def q_quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(
                F.col("rn")
                == F.ceil(F.col("n") * _WZ_LO / 100.0).cast("bigint"),
                F.col("value"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("rn")
                == F.ceil(F.col("n") * _WZ_HI / 100.0).cast("bigint"),
                F.col("value"),
            )
        ).alias("hi"),
    )
    wj = e.join(F.broadcast(bounds), "event_type")
    yw = (
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .cast("decimal(14,6)")
    )
    return wj.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("lo").alias(f"p{_WZ_LO}_lo"),
        F.max("hi").alias(f"p{_WZ_HI}_hi"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.round(
            F.sum(F.col("value").cast("decimal(14,6)")).cast("double")
            / F.max("n"),
            6,
        ).alias("mean_raw"),
        F.round(F.sum(yw).cast("double") / F.max("n"), 6).alias(
            "mean_winsor"
        ),
    )
