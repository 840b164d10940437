"""Wave-11 operators (round 3): monitoring/alerting and BI reporting.

- ``q_events_alert_debounce`` — hysteresis alerting with K-consecutive
  debounce: an alert fires only after K consecutive threshold breaches
  and clears only after K consecutive recoveries (the standard
  monitoring state machine that suppresses flapping). Expressed
  relationally: gaps-and-islands runs of the breach flag, QUALIFYING
  runs (len >= K) carry state, the previous state is an ignore-nulls
  window over run order, and an onset is a qualifying breach run whose
  previous state was clear — emitted at the K-th breach row's time.
- ``q_orders_backlog_aging`` — open-order backlog aging buckets at the
  corpus snapshot date (the receivables-style aging report): per
  status x age-bucket order counts and exact value totals.

Parity discipline as everywhere (plans/registry.py): identical run
construction and window frames on both engines, DECIMAL-exact value
sums, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.functions.numeric import dsum, dsum_sql
from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Hysteresis alerting with K-consecutive debounce
# ---------------------------------------------------------------------------

_ALERT_THRESH = 40.0  # ~median value: breaches ~45%, rich run structure at every sf
_ALERT_K = 3


@register(
    "q_events_alert_debounce",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts, value,
                   (value > {_ALERT_THRESH}) AS flag,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ),
        grp AS (
            SELECT *, rn - ROW_NUMBER() OVER (
                       PARTITION BY user_id, flag ORDER BY rn) AS g
            FROM seq
        ),
        runs AS (
            SELECT user_id, flag, MIN(rn) AS run_start,
                   COUNT(*) AS run_len,
                   MIN(rn) + {_ALERT_K} - 1 AS fire_rn
            FROM grp GROUP BY user_id, flag, g
        ),
        st AS (
            SELECT *,
                   CASE WHEN run_len >= {_ALERT_K} THEN flag END AS qual_state,
                   LAST_VALUE(CASE WHEN run_len >= {_ALERT_K} THEN flag END
                              IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY run_start
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_state
            FROM runs
        ),
        onsets AS (
            SELECT user_id, fire_rn, run_len
            FROM st
            WHERE flag AND run_len >= {_ALERT_K}
              AND (prev_state IS NULL OR NOT prev_state)
        )
        SELECT o.user_id, s.ts AS onset_ts,
               CAST(o.run_len AS BIGINT) AS run_len
        FROM onsets o JOIN seq s
          ON s.user_id = o.user_id AND s.rn = o.fire_rn
    """,
    doc=(
        "Hysteresis alerting with K=3-consecutive debounce over each "
        "user's value series: breach runs come from gaps-and-islands "
        "(rn minus per-flag rn), only runs of length >= K carry state, "
        "the previous state is an ignore-nulls last_value over run "
        "order, and an alert onset is a qualifying breach run whose "
        "previous state was clear — stamped with the K-th breach's "
        "event time. The monitoring state machine that suppresses "
        "flapping, fully relational. Scale: every window partitions by "
        "user; the run table is runs-per-user rows (data-compressed), "
        "and the onset join-back is keyed on (user, rn)."
    ),
    tags=("events", "monitoring", "window"),
)
def q_events_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value") > _ALERT_THRESH).alias("flag"),
    ).withColumn("rn", F.row_number().over(w_rn))
    w_flag = Window.partitionBy("user_id", "flag").orderBy("rn")
    grp = seq.withColumn("g", F.col("rn") - F.row_number().over(w_flag))
    runs = grp.groupBy("user_id", "flag", "g").agg(
        F.min("rn").alias("run_start"),
        F.count("*").alias("run_len"),
        (F.min("rn") + F.lit(_ALERT_K - 1)).alias("fire_rn"),
    )
    qual = F.when(F.col("run_len") >= _ALERT_K, F.col("flag"))
    w_runs = (
        Window.partitionBy("user_id")
        .orderBy("run_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    st = runs.withColumn("prev_state", F.last(qual, ignorenulls=True).over(w_runs))
    onsets = st.where(
        F.col("flag")
        & (F.col("run_len") >= _ALERT_K)
        & (F.col("prev_state").isNull() | ~F.col("prev_state"))
    ).select("user_id", "fire_rn", "run_len")
    return onsets.join(
        seq.select("user_id", F.col("rn").alias("fire_rn"), "ts"),
        ["user_id", "fire_rn"],
    ).select(
        "user_id",
        F.col("ts").alias("onset_ts"),
        F.col("run_len").cast("bigint").alias("run_len"),
    )


# ---------------------------------------------------------------------------
# Open-order backlog aging
# ---------------------------------------------------------------------------


@register(
    "q_orders_backlog_aging",
    oracle=f"""
        WITH snap AS (SELECT MAX(o_orderdate) AS s FROM orders),
        aged AS (
            SELECT o.o_orderstatus,
                   CASE
                       WHEN date_diff('day', o.o_orderdate, snap.s) <= 365
                           THEN '0-1y'
                       WHEN date_diff('day', o.o_orderdate, snap.s) <= 1095
                           THEN '1-3y'
                       ELSE '3y+'
                   END AS age_bucket,
                   o.o_totalprice
            FROM orders o CROSS JOIN snap
            WHERE o.o_orderstatus <> 'F'
        )
        SELECT o_orderstatus, age_bucket,
               COUNT(*) AS n_orders,
               {dsum_sql('o_totalprice', 'backlog_value')}
        FROM aged GROUP BY o_orderstatus, age_bucket
    """,
    doc=(
        "Open-order backlog aging at the corpus snapshot date (the "
        "receivables-style aging report every operational BI stack "
        "runs): non-finished orders bucketed by age against "
        "max(o_orderdate), per status x bucket counts and DECIMAL-exact "
        "value totals. Scale: one broadcast single-row snapshot, one "
        "partial-aggregated groupBy; buckets are computed map-side."
    ),
    tags=("relational", "aggregate", "bi"),
)
def q_orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    snap = o.groupBy().agg(F.max("o_orderdate").alias("s"))
    age = F.datediff(F.col("s"), F.col("o_orderdate"))
    bucket = (
        F.when(age <= 365, "0-1y").when(age <= 1095, "1-3y").otherwise("3y+")
    )
    return (
        o.where(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(snap))
        .groupBy("o_orderstatus", bucket.alias("age_bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "backlog_value"),
        )
    )
