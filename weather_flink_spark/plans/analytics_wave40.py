"""Wave-40 operator (round 6, continued): Markov entropy rate.

- ``q_events_entropy_rate`` — the entropy rate of the first-order
  user-journey Markov chain (Shannon 1948: H = −Σ_s π_s Σ_t P_st ln
  P_st, with π the empirical transition-source distribution, so
  H = −Σ_st (c_st/T)·ln(c_st/c_s)): one number for how PREDICTABLE
  user journeys are, normalized against ln|states| for the efficiency
  ratio — the information-theoretic summary of the transition matrix
  q_events_markov_transitions materializes (that entry gives the
  matrix; this one gives the scalar a monitoring dashboard alerts
  on). Each per-transition ln term is snapped ONCE to DECIMAL(18,9)
  and scaled to an exact BIGINT, so the weighted sum is exact integer
  arithmetic with two double ops at the very end (the wave-27
  bigint×decimal precision-trim lesson applied: never multiply a
  BIGINT count into a decimal — multiply into the SCALED INTEGER).

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_events_entropy_rate",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ) AS prev_type
            FROM events
        ),
        c AS (
            SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS cst
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        ),
        rows_tot AS (
            SELECT prev_type, CAST(SUM(cst) AS BIGINT) AS cs
            FROM c GROUP BY prev_type
        ),
        tot AS (
            SELECT CAST(SUM(cst) AS BIGINT) AS t,
                   CAST(COUNT(DISTINCT prev_type) AS BIGINT) AS n_states
            FROM c
        ),
        terms AS (
            -- ln P snapped ONCE to DECIMAL(18,9), scaled to an exact
            -- BIGINT; weighting by the BIGINT count stays integer
            SELECT c.cst
                   * CAST(CAST(CAST(ROUND(LN(CAST(c.cst AS DOUBLE) / r.cs), 9)
                               AS DECIMAL(18,9)) AS DECIMAL(28,9))
                          * 1000000000 AS BIGINT)
                       AS term9
            FROM c JOIN rows_tot r ON r.prev_type = c.prev_type
        )
        SELECT t.n_states, t.t AS n_transitions,
               ROUND(-(CAST(SUM(s.term9) AS DOUBLE) / 1000000000.0) / t.t,
                     9) AS entropy_rate,
               ROUND(LN(CAST(t.n_states AS DOUBLE)), 9) AS max_entropy,
               -- NULLIF: with one distinct prev_type ln(n_states)=0 and
               -- Spark/DuckDB disagree on double 0/0 (NULL vs NaN) —
               -- both engines emit NULL instead
               ROUND((-(CAST(SUM(s.term9) AS DOUBLE) / 1000000000.0) / t.t)
                     / NULLIF(LN(CAST(t.n_states AS DOUBLE)), 0),
                     6) AS efficiency
        FROM terms s CROSS JOIN tot t
        GROUP BY t.n_states, t.t
    """,
    doc=(
        "Entropy rate of the first-order user-journey Markov chain "
        "(H = −Σ (c_st/T)·ln(c_st/c_s)) with the ln|states| ceiling "
        "and the efficiency ratio — one scalar for journey "
        "predictability, the dashboard summary of the matrix "
        "q_events_markov_transitions materializes (efficiency → 1: "
        "journeys are uniform noise; → 0: deterministic funnels). "
        "Parity: each ln term snaps ONCE to DECIMAL(18,9) and scales "
        "to an exact BIGINT before the count weighting (multiplying "
        "the BIGINT into the decimal would trip Spark's precision-38 "
        "scale trim — the wave-27 lesson), so the weighted sum is "
        "exact integer arithmetic; two double ops at the end. Scale: "
        "one user_id shuffle for the lag, then |types|² math."
    ),
    tags=("statistics", "sequence", "information"),
)
def q_events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("bigint").alias("cst")
    )
    rows_tot = c.groupBy("prev_type").agg(
        F.sum("cst").cast("bigint").alias("cs")
    )
    tot = c.agg(
        F.sum("cst").cast("bigint").alias("t"),
        F.countDistinct("prev_type").cast("bigint").alias("n_states"),
    )
    term9 = F.col("cst") * (
        F.round(F.log(F.col("cst").cast("double") / F.col("cs")), 9)
        .cast("decimal(18,9)")
        .cast("decimal(28,9)")
        * F.lit(1000000000)
    ).cast("bigint")
    terms = c.join(F.broadcast(rows_tot), "prev_type").select(
        term9.alias("term9")
    )
    agg = terms.agg(F.sum("term9").alias("s9")).crossJoin(F.broadcast(tot))
    h = -(F.col("s9").cast("double") / F.lit(1000000000.0)) / F.col("t")
    hmax = F.log(F.col("n_states").cast("double"))
    return agg.select(
        "n_states",
        F.col("t").alias("n_transitions"),
        F.round(h, 9).alias("entropy_rate"),
        F.round(hmax, 9).alias("max_entropy"),
        # single-state chain: hmax = ln(1) = 0 and Spark's 0/0 is NaN
        # where DuckDB's is NULL — guard so both engines emit NULL
        F.round(F.when(hmax != F.lit(0.0), h / hmax), 6).alias(
            "efficiency"
        ),
    )
