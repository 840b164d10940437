"""Semi-structured + event-time batch queries over the ``events`` table.

These are the batch twins of the streaming surface (SURVEY.md §2-C
streaming block): the same tumbling-window aggregation that
``streaming/`` runs with a watermark is expressed here over bounded
data so the DuckDB oracle can check window semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from weather_flink_spark.functions.numeric import dsum, dsum_sql
from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_json_props_extract",
    oracle="""
        SELECT
            event_id,
            event_type,
            CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
            (CAST(json_extract_string(props, '$.k') AS INT) > 50) AS k_high
        FROM events
    """,
    doc="Semi-structured extraction: JSON path into typed column (get_json_object).",
    tags=("json",),
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        "event_type",
        k.alias("prop_k"),
        (k > 50).alias("k_high"),
    )


@register(
    "q_json_from_json_map",
    oracle="""
        SELECT
            event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
            1 AS n_keys
        FROM events
    """,
    doc="from_json into MapType + map introspection (map_keys/element access).",
    tags=("json",),
)
def q_json_from_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return e.select(
        "event_id",
        m.getItem("k").alias("k_val"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


@register(
    "q_tumbling_batch",
    oracle=f"""
        SELECT
            DATE_TRUNC('hour', ts) AS window_start,
            DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end,
            event_type,
            COUNT(*) AS n_events,
            {dsum_sql('value', 'sum_value')},
            COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2, 3
    """,
    doc=(
        "Batch twin of the streaming tumbling-window aggregation: 1-hour "
        "tumble by event_type (window() struct flattened to start/end)."
    ),
    tags=("window-time", "streaming-twin"),
)
def q_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


@register(
    "q_sliding_batch",
    oracle=f"""
        WITH windowed AS (
            SELECT
                time_bucket(INTERVAL 30 MINUTE, ts) - TO_MINUTES(s.i * 30) AS window_start,
                value
            FROM events e, (SELECT UNNEST([0, 1]) AS i) s
        )
        SELECT
            window_start,
            window_start + INTERVAL 60 MINUTE AS window_end,
            COUNT(*) AS n_events,
            {dsum_sql('value', 'sum_value')}
        FROM windowed
        GROUP BY 1, 2
    """,
    doc=(
        "Batch twin of the sliding-window aggregation: 60-minute windows "
        "sliding every 30 (each event lands in 2 windows)."
    ),
    tags=("window-time", "streaming-twin"),
)
def q_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_session_batch",
    oracle="""
        WITH ordered AS (
            SELECT
                user_id, ts, event_id,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR DATE_DIFF('millisecond', LAG(ts) OVER w, ts) > 1800000
                     THEN 1 ELSE 0 END AS is_new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sessions AS (
            SELECT
                user_id, ts,
                CAST(SUM(is_new_session) OVER (
                    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS BIGINT) AS session_id
            FROM ordered
        )
        SELECT
            user_id,
            session_id,
            MIN(ts) AS session_start,
            MAX(ts) AS session_end,
            COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
    doc=(
        "Batch twin of session windows (30-minute gap): gap-detection via "
        "lag + running sum of session-start markers — the presence/session "
        "semantics of the reference's intended plan (SURVEY.md §2-B B3)."
    ),
    tags=("window-time", "streaming-twin", "session"),
)
def q_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_ms = (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) / 1000
    marked = e.withColumn(
        "is_new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_ms > 1800000), 1).otherwise(0),
    )
    sessions = marked.withColumn("session_id", F.sum("is_new_session").over(w_run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@register(
    "q_events_resample_gapfill",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
            FROM events
        ),
        grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (
                SELECT UNNEST(generate_series(
                    (SELECT lo FROM bounds), (SELECT hi FROM bounds), INTERVAL 1 HOUR)) AS h
            ) g
        )
        SELECT g.event_type, g.h AS bucket_hour,
               COALESCE(hy.n, 0) AS n_events,
               LAST_VALUE(hy.avg_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_value_filled
        FROM grid g
        LEFT JOIN hourly hy ON hy.event_type = g.event_type AND hy.h = g.h
    """,
    doc=(
        "Time-series resample + gap-fill: hourly per-type averages on a "
        "dense generated grid, empty buckets forward-filled from the "
        "last observation (last_value IGNORE NULLS). The grid comes "
        "from sequence() over broadcast min/max bounds — no driver "
        "loop, no cartesian blow-up (types × hours only)."
    ),
    tags=("window-time", "timeseries"),
)
def q_events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("value")).alias(
            "avg_value"
        ),
        F.count("*").alias("n"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        e.select("event_type")
        .distinct()
        .join(F.broadcast(bounds))
        .select("event_type", F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = grid.join(hourly, ["event_type", "h"], "left")
    return joined.select(
        "event_type",
        F.col("h").alias("bucket_hour"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_filled"),
    )


@register(
    "q_json_variant",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_high,
               json_extract_string(props, '$.missing') AS absent
        FROM events
    """,
    doc=(
        "Spark 4 VARIANT ingestion: parse_json once into a variant "
        "value, then typed variant_get extractions — the "
        "semi-structured path that keeps the parsed tree in a binary "
        "columnar encoding instead of re-parsing JSON text per field "
        "(the at-scale advantage over get_json_object on wide "
        "extraction lists). Missing paths yield NULL."
    ),
    tags=("json", "variant"),
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k.alias("k_val"),
        (k > 50).alias("k_high"),
        F.variant_get(v, "$.missing", "string").alias("absent"),
    )
