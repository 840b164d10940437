"""Wave-55 operators (round 8): grouped k-fold CV splits, Theil-Sen
robust trend, and local-maxima peak detection.

- ``q_split_group_kfold`` — GROUP k-fold cross-validation assignment
  (scikit-learn's GroupKFold discipline applied at corpus scale): the
  fold is a seeded md5 hash of the GROUP key (user_id), never the row,
  so every event of a user lands in one fold by construction — the
  leakage-safe CV split for user-correlated data (a row-hash split
  would put one user's near-duplicate events in train AND test).
  Completes the split family (q_split_train_val_test rows,
  q_split_leakage_check audit). Output per fold: event/user counts +
  share; the no-straddle property is proven in tests (per-user
  distinct-fold count == 1 for every user).
- ``q_stats_theil_sen`` — Theil-Sen robust trend estimator over the
  daily event-count series (median of all pairwise slopes; Sen 1968):
  up to 29% of days can be wild outliers without moving the estimate,
  where q_agg_linear_regression's OLS line follows them. The pair
  space is CALENDAR-bounded (days², not data-sized); medians are
  exact order statistics (row_number positions, avg of the two
  middles when even); the OLS slope is surfaced beside it for the
  robustness comparison.
- ``q_events_peaks`` — local-maxima peak detection per user over the
  daily series: a day is a peak iff its count strictly exceeds the
  previous day's and is >= the next day's (lag/lead windows; series
  edges never qualify — both neighbors must exist), with the peak's
  prominence-lite ``rise`` (count − prev) attached. The point-event
  counterpart of q_events_changepoint/cusum's sustained shifts.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``); these extend the north-star
surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

_KFOLD = 5
_EPOCH = "2024-01-01"


@register(
    "q_split_group_kfold",
    oracle=f"""
        WITH f AS (
            SELECT user_id,
                   CAST('0x' || md5('gkfold:' || CAST(user_id AS VARCHAR))[1:7]
                        AS BIGINT) % {_KFOLD} AS fold
            FROM events
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
        SELECT fold,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot), 6)
                   AS share
        FROM f GROUP BY fold
    """,
    doc=(
        "Grouped k-fold CV assignment (GroupKFold): fold = seeded md5 "
        "of the GROUP key (user_id) % 5, never the row — every event "
        "of a user lands in exactly one fold by construction, the "
        "leakage-safe split for user-correlated data (row-hash splits "
        "leak a user's near-duplicate events across train/test). "
        "No-straddle proven in tests; deterministic across engines, "
        "runs, cluster sizes (never rand()). One groupBy; the hash "
        "is the same seeded-md5 discipline as q_split_train_val_test."
    ),
    tags=("split", "sampling", "llm-pipeline"),
)
def q_split_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    fold = F.expr(
        "cast(conv(substring(md5(concat('gkfold:', cast(user_id as string))),"
        f" 1, 7), 16, 10) as bigint) % {_KFOLD}"
    )
    tot = e.agg(F.count("*").cast("bigint").alias("n"))
    return (
        e.select(fold.alias("fold"), "user_id")
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "n_events",
            "n_users",
            F.round(F.col("n_events").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
        )
    )


def _daily_cte_duck() -> str:
    return f"""
        daily AS (
            SELECT DATE_DIFF('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS x,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1
        )"""


@register(
    "q_stats_theil_sen",
    oracle=f"""
        WITH {_daily_cte_duck()},
        pairs AS (
            SELECT a.x AS x1, b.x AS x2,
                   CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
            FROM daily a JOIN daily b ON b.x > a.x
        ),
        ranked AS (
            SELECT slope,
                   ROW_NUMBER() OVER (ORDER BY slope ASC, x1 ASC, x2 ASC)
                       AS rk,
                   COUNT(*) OVER () AS n
            FROM pairs
        ),
        med AS (
            SELECT AVG(slope) AS slope_med FROM ranked
            WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
        ),
        resid AS (
            SELECT d.y - m.slope_med * d.x AS b0, d.x
            FROM daily d CROSS JOIN med m
        ),
        rranked AS (
            SELECT b0, ROW_NUMBER() OVER (ORDER BY b0 ASC, x ASC) AS rk,
                   COUNT(*) OVER () AS n
            FROM resid
        ),
        bmed AS (
            SELECT AVG(b0) AS intercept_med FROM rranked
            WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
        ),
        ols AS (
            SELECT (CAST(COUNT(*) AS DOUBLE) * SUM(CAST(x AS DOUBLE) * y)
                    - SUM(CAST(x AS DOUBLE)) * SUM(CAST(y AS DOUBLE)))
                   / (CAST(COUNT(*) AS DOUBLE) * SUM(CAST(x AS DOUBLE) * x)
                      - SUM(CAST(x AS DOUBLE)) * SUM(CAST(x AS DOUBLE)))
                       AS ols_slope,
                   CAST(COUNT(*) AS BIGINT) AS n_days
            FROM daily
        )
        SELECT ROUND(m.slope_med, 6) AS ts_slope,
               ROUND(b.intercept_med, 6) AS ts_intercept,
               ROUND(o.ols_slope, 6) AS ols_slope,
               o.n_days,
               CAST(o.n_days * (o.n_days - 1) / 2 AS BIGINT) AS n_pairs
        FROM med m CROSS JOIN bmed b CROSS JOIN ols o
    """,
    doc=(
        "Theil-Sen robust trend (Sen 1968) over the daily event-count "
        "series: slope = exact MEDIAN of all pairwise slopes "
        "(row_number order statistics, avg of the two middles when "
        "even, slope/x1/x2 total order), intercept = median residual; "
        "up to 29% outlier days cannot move it where OLS follows them "
        "— the OLS slope is surfaced beside it for the comparison. "
        "Scale: the pair space is CALENDAR-bounded (days² after the "
        "daily rollup, never data-sized); the daily rollup is the "
        "only data-sized pass. Doubles divide engine-identically "
        "(IEEE); medians select by position, not value arithmetic."
    ),
    tags=("statistics", "timeseries", "robust", "analytics"),
)
def q_stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date")).alias("x")
        )
        .groupBy("x")
        .agg(F.count("*").cast("bigint").alias("y"))
        .transform(snapshot())  # tiny calendar-bounded frame, reused 4x
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("b.x") > F.col("a.x")).select(
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
    )
    # global median rank via the two-pass range-partitioned primitive
    # (operators/global_order) — a bare Window.orderBy would collapse
    # the pair table onto one task (the registry-wide scale net
    # forbids it, calendar-bounded or not)
    from weather_flink_spark.operators.global_order import (
        attach_global_row_number,
    )

    # num_partitions=2: the pair table is calendar-bounded (days^2),
    # so the two-pass rank needs distribution-correctness, not width —
    # 32 range partitions cost ~3 s of pure scheduling here (measured)
    ranked = attach_global_row_number(
        pairs,
        [F.col("slope").asc(), F.col("x1").asc(), F.col("x2").asc()],
        out_col="rk",
        num_partitions=2,
    )
    n_pairs_df = ranked.agg(F.count("*").cast("bigint").alias("n"))
    med = (
        ranked.crossJoin(F.broadcast(n_pairs_df))
        .filter(
            (F.col("rk") == F.expr("(n + 1) div 2"))
            | (F.col("rk") == F.expr("(n + 2) div 2"))
        )
        .agg(F.avg("slope").alias("slope_med"))
    )
    resid = daily.crossJoin(F.broadcast(med)).select(
        (F.col("y") - F.col("slope_med") * F.col("x")).alias("b0"), "x"
    )
    rranked = attach_global_row_number(
        resid, [F.col("b0").asc(), F.col("x").asc()], out_col="rk",
        num_partitions=2,
    )
    n_resid_df = rranked.agg(F.count("*").cast("bigint").alias("n"))
    bmed = (
        rranked.crossJoin(F.broadcast(n_resid_df))
        .filter(
            (F.col("rk") == F.expr("(n + 1) div 2"))
            | (F.col("rk") == F.expr("(n + 2) div 2"))
        )
        .agg(F.avg("b0").alias("intercept_med"))
    )
    xd = F.col("x").cast("double")
    ols = daily.agg(
        (
            (F.count("*").cast("double") * F.sum(xd * F.col("y")))
            - F.sum(xd) * F.sum(F.col("y").cast("double"))
        ).alias("num"),
        (
            F.count("*").cast("double") * F.sum(xd * xd)
            - F.sum(xd) * F.sum(xd)
        ).alias("den"),
        F.count("*").cast("bigint").alias("n_days"),
    ).select(
        (F.col("num") / F.col("den")).alias("ols_slope"), "n_days"
    )
    return (
        med.crossJoin(F.broadcast(bmed))
        .crossJoin(F.broadcast(ols))
        .select(
            F.round("slope_med", 6).alias("ts_slope"),
            F.round("intercept_med", 6).alias("ts_intercept"),
            F.round("ols_slope", 6).alias("ols_slope"),
            "n_days",
            (F.col("n_days") * (F.col("n_days") - 1) / 2)
            .cast("bigint")
            .alias("n_pairs"),
        )
    )


@register(
    "q_events_peaks",
    oracle=f"""
        WITH d AS (
            SELECT user_id,
                   DATE_DIFF('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS x,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        lagd AS (
            SELECT user_id, x, y,
                   LAG(y) OVER w AS prev_y,
                   LEAD(y) OVER w AS next_y
            FROM d
            WINDOW w AS (PARTITION BY user_id ORDER BY x ASC)
        )
        SELECT user_id, x AS day_x, y AS n_events,
               y - prev_y AS rise
        FROM lagd
        WHERE prev_y IS NOT NULL AND next_y IS NOT NULL
          AND y > prev_y AND y >= next_y
    """,
    doc=(
        "Local-maxima peak detection per user over the daily series: "
        "peak iff count strictly exceeds the previous day and >= the "
        "next (lag/lead over the user window; edges never qualify), "
        "with rise = count - prev attached — the point-event "
        "counterpart of q_events_changepoint/cusum's sustained "
        "shifts. One partitioned window pass; integer-exact."
    ),
    tags=("events", "timeseries", "analytics"),
)
def q_events_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    d = (
        e.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date")).alias(
                "x"
            ),
        )
        .groupBy("user_id", "x")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("x").asc())
    lagd = d.select(
        "user_id",
        "x",
        "y",
        F.lag("y").over(w).alias("prev_y"),
        F.lead("y").over(w).alias("next_y"),
    )
    return lagd.filter(
        F.col("prev_y").isNotNull()
        & F.col("next_y").isNotNull()
        & (F.col("y") > F.col("prev_y"))
        & (F.col("y") >= F.col("next_y"))
    ).select(
        "user_id",
        F.col("x").alias("day_x"),
        F.col("y").alias("n_events"),
        (F.col("y") - F.col("prev_y")).alias("rise"),
    )
