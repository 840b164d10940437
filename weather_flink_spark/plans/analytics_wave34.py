"""Wave-34 operator (round 6, continued): partial autocorrelation via
Durbin-Levinson.

- ``q_events_pacf`` — PACF of the global hourly count series at lags
  1..3, the model-identification companion of q_events_acf (ACF tails
  off / PACF cuts at p ⇒ AR(p); the pair is how Box-Jenkins picks an
  order, and the repo already fits AR(2) in q_events_ar2_fit — PACF
  is the diagnostic that justifies that choice). Autocorrelations use
  the STANDARD biased estimator (common mean/variance, r_k = γ_k/γ_0)
  rather than per-lag Pearson: scaled by n², every numerator and the
  denominator are EXACT BIGINTs (n²·Σ'x_t·x_{t+k} − n·S·(Σ'a + Σ'b)
  + (n−k)·S²), so r_1..r_3 are single exact-integer divisions and the
  Durbin-Levinson recursion (φ11 = r1; φ22 = (r2−r1²)/(1−r1²);
  φ33 from the level-2 coefficients) is a fixed double expression
  written identically on both engines.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_PACF_LAGS = (1, 2, 3)


# Exact-BIGINT scaled autocovariance numerators per lag k:
# n²·Σ'xy − n·S·(Σ'a + Σ'b) + (n−k)·S² over the dense hourly series.
_R_DUCK = """
        hc AS (
            SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hr,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        bounds AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM hc),
        dense AS MATERIALIZED (
            SELECT g.hr, COALESCE(hc.c, 0) AS c
            FROM (SELECT UNNEST(range(h0, h1 + 1)) AS hr FROM bounds) g
            LEFT JOIN hc ON hc.hr = g.hr
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s,
                   CAST(SUM(c * c) AS BIGINT) AS sxx
            FROM dense
        ),
        lagm AS (
            SELECT l.k,
                   CAST(SUM(a.c * b.c) AS BIGINT) AS sxy,
                   CAST(SUM(a.c) AS BIGINT) AS sa,
                   CAST(SUM(b.c) AS BIGINT) AS sb
            FROM (VALUES (1), (2), (3)) l(k)
            JOIN dense a ON TRUE
            JOIN dense b ON b.hr = a.hr + l.k
            GROUP BY l.k
        ),
        rr AS (
            -- r_k = (n^2 Σ'xy - nS(Σ'a+Σ'b) + (n-k)S^2)
            --     / (n^2 Σx^2  - n S^2)          — both EXACT BIGINT
            SELECT k,
                   CAST(n * n * sxy - n * s * (sa + sb) + (n - k) * s * s
                        AS DOUBLE)
                   / CAST(n * n * sxx - n * s * s AS DOUBLE) AS r
            FROM lagm CROSS JOIN tot
        ),
        rp AS (
            SELECT MAX(CASE WHEN k = 1 THEN r END) AS r1,
                   MAX(CASE WHEN k = 2 THEN r END) AS r2,
                   MAX(CASE WHEN k = 3 THEN r END) AS r3
            FROM rr
        )
"""

# Durbin-Levinson, one fixed text (phi21 = r1 - phi22*r1):
_DL_SELECT = """
        SELECT ROUND(r1, 9) AS r1, ROUND(r2, 9) AS r2, ROUND(r3, 9) AS r3,
               ROUND(r1, 9) AS pacf1,
               ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 9) AS pacf2,
               ROUND((r3
                      - (r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) * r2
                      - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1)
                     / (1.0
                        - (r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) * r1
                        - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2), 9)
                   AS pacf3
        FROM rp
"""


@register(
    "q_events_pacf",
    oracle=f"WITH {_R_DUCK} {_DL_SELECT}",
    doc=(
        "Partial autocorrelation (Durbin-Levinson) of the hourly count "
        "series at lags 1..3 — the Box-Jenkins model-identification "
        "companion of q_events_acf (PACF cutting at p identifies "
        "AR(p); q_events_ar2_fit is the fit this diagnostic "
        "justifies). Autocorrelations use the standard common-"
        "normalization estimator, scaled by n² so numerator and "
        "denominator are EXACT BIGINTs (one double division per r_k); "
        "the DL recursion is one fixed double expression identical on "
        "both engines. Scale: the dense hourly rollup (map-side "
        "partial agg, ~9k rows/year) + three bounded lag self-joins "
        "on dense integer keys — nothing global, no ordered window."
    ),
    tags=("timeseries", "statistics"),
)
def q_events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hc = e.groupBy(F.expr("cast(ts as long) div 3600").alias("hr")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    grid = hc.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1")).select(
        F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    dense = grid.join(hc, "hr", "left").select(
        "hr", F.coalesce("c", F.lit(0).cast("bigint")).alias("c")
    )
    tot = dense.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sxx"),
    )
    lags = spark.createDataFrame([(k,) for k in _PACF_LAGS], "k long")
    a = dense.crossJoin(F.broadcast(lags))
    b = dense.select(F.col("hr").alias("bhr"), F.col("c").alias("bc"))
    lagm = (
        a.join(b, F.col("bhr") == F.col("hr") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("c") * F.col("bc")).cast("bigint").alias("sxy"),
            F.sum("c").cast("bigint").alias("sa"),
            F.sum("bc").cast("bigint").alias("sb"),
        )
    )
    rr = lagm.crossJoin(F.broadcast(tot)).select(
        "k",
        (
            (
                F.col("n") * F.col("n") * F.col("sxy")
                - F.col("n") * F.col("s") * (F.col("sa") + F.col("sb"))
                + (F.col("n") - F.col("k")) * F.col("s") * F.col("s")
            ).cast("double")
            / (
                F.col("n") * F.col("n") * F.col("sxx")
                - F.col("n") * F.col("s") * F.col("s")
            ).cast("double")
        ).alias("r"),
    )
    rp = rr.agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("r"))).alias(f"r{k}")
            for k in _PACF_LAGS
        ]
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi22 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    phi21 = r1 - phi22 * r1
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (
        F.lit(1.0) - phi21 * r1 - phi22 * r2
    )
    return rp.select(
        F.round(r1, 9).alias("r1"),
        F.round(r2, 9).alias("r2"),
        F.round(r3, 9).alias("r3"),
        F.round(r1, 9).alias("pacf1"),
        F.round(phi22, 9).alias("pacf2"),
        F.round(pacf3, 9).alias("pacf3"),
    )
