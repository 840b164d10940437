"""Time-series statistics operators over ``events`` (SURVEY.md §2-C
"hypertable/continuous-aggregate" extension block).

The reference engine's time-series surface (rollups, gauge/counter
aggregation, downsampling) re-expressed Spark-first:

- OHLC bars: ordered-first/last per bucket via ``min_by``/``max_by``
  on a (ts, event_id) struct key — one shuffle on the group key, no
  window pass, map-side partial aggregation applies.
- Time-weighted average: lag/lead interval weighting — the classic
  irregular-sampling gauge aggregate.
- Counter resets: monotonic-counter delta extraction that survives
  resets (value drops ⇒ new epoch), the Prometheus/Timescale
  ``counter_agg`` semantics.
- Exact percentiles: Spark's exact ``percentile`` (sort-based within
  group) vs DuckDB ``quantile_cont``.
- Moving median / moving distinct count: frame-bounded order
  statistics. Spark forbids ORDER BY frames for ``median``; the moving
  median is built from ``collect_list`` + ``array_sort`` + explicit
  midpoint interpolation — a total expression, bounded by the frame
  size (31 values max here), entirely JVM-side.
- Timezone conversion: ``from_utc_timestamp``/``to_utc_timestamp``
  with a session-tz-independent DuckDB oracle (double ``timezone()``
  application).

All sums route through DECIMAL (functions/numeric.py) so partition-
order-dependent float accumulation can never drift from the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.functions.numeric import dsum, dsum_sql
from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_events_ohlc",
    oracle="""
        SELECT
            event_type,
            DATE_TRUNC('hour', ts) AS bucket_hour,
            FIRST(value ORDER BY ts ASC, event_id ASC)  AS open,
            LAST(value  ORDER BY ts ASC, event_id ASC)  AS close,
            MAX(value) AS high,
            MIN(value) AS low,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume,
            COUNT(*) AS n_obs
        FROM events
        GROUP BY 1, 2
    """,
    doc=(
        "OHLC candlestick bars: ordered first/last (open/close) per "
        "hourly bucket via min_by/max_by on a (ts, event_id) struct — "
        "a single groupBy shuffle with map-side combine, no window "
        "sort pass. The streaming twin is a tumbling-window agg."
    ),
    tags=("timeseries",),
)
def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_hour"))
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max_by("value", order_key).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            dsum("value", "volume"),
            F.count("*").alias("n_obs"),
        )
    )


@register(
    "q_events_time_weighted_avg",
    oracle="""
        WITH spans AS (
            SELECT
                user_id,
                value,
                CAST(DATE_DIFF('microsecond', ts,
                     LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC)) AS BIGINT
                ) // 1000 AS dt_ms
            FROM events
        )
        SELECT
            user_id,
            COUNT(*) AS n_spans,
            CAST(SUM(dt_ms) AS BIGINT) AS total_ms,
            CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(dt_ms AS DECIMAL(20,0)))
                 AS DOUBLE)
            / CAST(SUM(dt_ms) AS DOUBLE) AS twa
        FROM spans
        WHERE dt_ms IS NOT NULL
        GROUP BY user_id
    """,
    doc=(
        "Time-weighted average for irregularly sampled gauges: each "
        "observation is held until the next one (LOCF integration), "
        "weight = milliseconds to the next observation in the same "
        "user series. Exact decimal weighted sum; the final divide is "
        "double/double on both engines. Millisecond weights + 2dp "
        "gauges keep the numerator's raw integer under 2^53, so "
        "DuckDB's two-step decimal->double conversion (int then "
        "/10^scale) rounds once, bit-identical to Spark's "
        "BigDecimal.doubleValue. One window pass + one shuffle."
    ),
    tags=("timeseries",),
)
def q_events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # integer floor-div µs->ms (positive deltas), matching DuckDB's `// 1000`
    dt_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    spans = (
        e.select("user_id", "value", dt_us.alias("dt_us"))
        .filter(F.col("dt_us").isNotNull())
        .select("user_id", "value", F.expr("dt_us div 1000").alias("dt_ms"))
    )
    # (18,2) x (20,0) -> DECIMAL(38,2): exact, and the summed raw int
    # stays < 2^53 so the double conversion is single-rounded on both
    # engines (see oracle doc above)
    weighted = F.col("value").cast("decimal(18,2)") * F.col("dt_ms").cast("decimal(20,0)")
    return spans.groupBy("user_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("dt_ms").alias("total_ms"),
        (F.sum(weighted).cast("double") / F.sum("dt_ms").cast("double")).alias("twa"),
    )


@register(
    "q_events_counter_resets",
    oracle="""
        WITH deltas AS (
            SELECT
                user_id, event_id, ts, value,
                value - LAG(value) OVER w AS delta
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT
            user_id, event_id, ts, value,
            CASE WHEN delta IS NULL THEN 0.0
                 WHEN delta < 0 THEN value
                 ELSE delta END AS increase,
            (delta IS NOT NULL AND delta < 0) AS is_reset,
            CAST(SUM(CAST(CASE WHEN delta IS NULL THEN 0.0
                               WHEN delta < 0 THEN value
                               ELSE delta END AS DECIMAL(18,6))) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) AS counter_total
        FROM deltas
    """,
    doc=(
        "Counter-reset extraction (Prometheus rate / Timescale "
        "counter_agg semantics): a drop in a monotonic counter starts "
        "a new epoch and contributes the post-reset value; the running "
        "decimal sum of increases is the reset-corrected counter. "
        "Per-row double subtraction is deterministic on both engines; "
        "only the accumulation needs decimal."
    ),
    tags=("timeseries", "window"),
)
def q_events_counter_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    delta = F.col("value") - F.lag("value").over(w)
    increase = (
        F.when(delta.isNull(), F.lit(0.0))
        .when(delta < 0, F.col("value"))
        .otherwise(delta)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        increase.alias("increase"),
        (delta.isNotNull() & (delta < 0)).alias("is_reset"),
        F.sum(increase.cast("decimal(18,6)"))
        .over(w_run)
        .cast("double")
        .alias("counter_total"),
    )


@register(
    "q_agg_percentile_exact",
    oracle="""
        SELECT
            event_type,
            quantile_cont(value, [0.25, 0.5, 0.75]) AS pcts,
            median(value) AS med,
            MIN(value) AS lo,
            MAX(value) AS hi
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "Exact grouped percentiles: Spark's sort-based percentile() "
        "(array form) vs DuckDB quantile_cont — both linear-interpolate "
        "at p*(n-1). Exact order statistics need a per-group sort; at "
        "scale prefer q_agg_approx_quantile (t-digest-style sketch) and "
        "keep this for low-cardinality grouped audits."
    ),
    tags=("aggregate", "timeseries"),
)
def q_agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("pcts"),
        F.median("value").alias("med"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@register(
    "q_win_moving_median",
    oracle="""
        SELECT
            user_id, event_id, ts, value,
            MEDIAN(value) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
            ) AS med5,
            MEDIAN(value) OVER (PARTITION BY user_id) AS med_user
        FROM events
    """,
    doc=(
        "Moving 5-row median (order statistic over a bounded frame). "
        "Spark forbids ORDER BY frames for median(), so the frame "
        "median is collect_list over the frame + array_sort + explicit "
        "midpoint interpolation — a total JVM-side expression whose "
        "cost is bounded by the frame width, shuffle-free beyond the "
        "one window sort. The partition-level median uses the native "
        "median() (frameless windows are allowed)."
    ),
    tags=("window", "timeseries"),
)
def q_win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w5 = w.rowsBetween(-4, 0)
    els = F.array_sort(F.collect_list("value").over(w5))
    n = F.size(els)
    mid_hi = F.element_at(els, (n.cast("int") / 2 + 1).cast("int"))
    mid_lo = F.element_at(els, (n.cast("int") / 2).cast("int"))
    med5 = F.when(n % 2 == 1, F.element_at(els, ((n + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2
    )
    w_user = Window.partitionBy("user_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        med5.alias("med5"),
        F.median("value").over(w_user).alias("med_user"),
    )


@register(
    "q_win_moving_distinct",
    oracle="""
        SELECT
            user_id, event_id, ts, event_type,
            COUNT(DISTINCT event_type) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
            ) AS distinct_types_10,
            COUNT(DISTINCT event_type) OVER (PARTITION BY user_id)
                AS distinct_types_all
        FROM events
    """,
    doc=(
        "Moving distinct count over the last 10 observations. Spark "
        "has no DISTINCT window aggregates; size(collect_set) over the "
        "frame computes the same thing (frame-bounded state, JVM-side)."
    ),
    tags=("window", "timeseries"),
)
def q_win_moving_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w10 = w.rowsBetween(-9, 0)
    w_all = Window.partitionBy("user_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.size(F.collect_set("event_type").over(w10)).cast("long").alias("distinct_types_10"),
        F.size(F.collect_set("event_type").over(w_all)).cast("long").alias("distinct_types_all"),
    )


@register(
    "q_time_zones",
    oracle="""
        SELECT
            event_id,
            ts,
            timezone('America/New_York', timezone('UTC', ts)) AS ny_wall,
            timezone('UTC', timezone('Asia/Tokyo', ts)) AS tokyo_as_utc,
            CAST(EXTRACT(hour FROM timezone('America/New_York',
                                            timezone('UTC', ts))) AS INT)
                AS ny_hour,
            (EXTRACT(hour FROM timezone('America/New_York',
                                        timezone('UTC', ts)))
             <> EXTRACT(hour FROM ts + INTERVAL 19 HOUR)) AS ny_is_dst
        FROM events
    """,
    doc=(
        "Timezone conversion with real tz rules (DST-aware): "
        "from_utc_timestamp renders the UTC instant as New York wall "
        "time; to_utc_timestamp interprets the naive ts as Tokyo wall "
        "time. The DuckDB oracle uses double timezone() application "
        "(naive -> instant -> target wall), which is independent of "
        "the oracle session's TimeZone setting. ny_is_dst flags rows "
        "where the NY offset differs from standard EST (UTC-5): "
        "ts+19h mod 24 equals the EST hour."
    ),
    tags=("datetime",),
)
def q_time_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    est = F.hour(F.col("ts") + F.expr("INTERVAL 19 HOURS"))
    return e.select(
        "event_id",
        "ts",
        ny.alias("ny_wall"),
        F.to_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_as_utc"),
        F.hour(ny).alias("ny_hour"),
        (F.hour(ny) != est).alias("ny_is_dst"),
    )


@register(
    "q_win_ewma",
    oracle="""
        WITH framed AS (
            SELECT user_id, event_id, ts, value,
                   LIST(value) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
                   ) AS els
            FROM events
        )
        SELECT user_id, event_id, ts, value,
               list_reduce(els, (acc, v) -> 0.3 * v + 0.7 * acc) AS ewma10
        FROM framed
    """,
    doc=(
        "Exponentially-weighted moving average (alpha=0.3) over the "
        "last 10 observations per user. EWMA is recursive, which SQL "
        "windows can't express directly — both engines fold the frame-"
        "collected list sequentially (Spark aggregate() seeded with the "
        "first element == DuckDB list_reduce), so the recursion runs as "
        "a bounded higher-order expression, JVM-side, bit-identical "
        "float order on both engines."
    ),
    tags=("window", "timeseries"),
)
def q_win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w10 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-9, 0)
    )
    els = F.collect_list("value").over(w10)
    ewma = F.aggregate(
        F.slice(els, 2, F.size(els) - 1),
        F.element_at(els, 1),
        lambda acc, v: F.lit(0.3) * v + F.lit(0.7) * acc,
    )
    return e.select("user_id", "event_id", "ts", "value", ewma.alias("ewma10"))


@register(
    "q_win_rolling_corr",
    oracle="""
        WITH base AS (
            SELECT user_id, event_id, ts, value,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        moments AS (
            SELECT user_id, event_id, ts, value, k,
                   COUNT(*) OVER w AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sx,
                   CAST(SUM(k) OVER w AS DOUBLE) AS sy,
                   CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(k AS DECIMAL(18,0)))
                        OVER w AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                        OVER w AS DOUBLE) AS sxx,
                   CAST(SUM(k * k) OVER w AS DOUBLE) AS syy
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id, ts, n,
               CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                    THEN (n * sxy - sx * sy)
                         / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
               END AS roll_corr20
        FROM moments
    """,
    doc=(
        "Rolling Pearson correlation (value vs the JSON 'k' prop, last "
        "20 rows per user). Naive windowed corr() drifts between "
        "engines (different accumulation orders); here the five moment "
        "sums are decimal-exact over the frame, and the correlation is "
        "one deterministic double expression over those exact sums — "
        "degenerate frames (zero variance) return NULL on both sides. "
        "The raw decimal ints stay under 2^53 so every decimal->double "
        "cast single-rounds."
    ),
    tags=("window", "timeseries", "stats"),
)
def q_win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    base = e.select("user_id", "event_id", "ts", "value", k.alias("k")).filter(
        F.col("k").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-19, 0)
    )
    vdec = F.col("value").cast("decimal(18,2)")
    kdec = F.col("k").cast("decimal(18,0)")
    n = F.count("*").over(w)
    sx = F.sum(vdec).over(w).cast("double")
    sy = F.sum("k").over(w).cast("double")
    sxy = F.sum(vdec * kdec).over(w).cast("double")
    sxx = F.sum(vdec * vdec).over(w).cast("double")
    syy = F.sum(F.col("k") * F.col("k")).over(w).cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    corr = F.when(
        (var_x > 0) & (var_y > 0),
        (n * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y)),
    )
    return base.select(
        "user_id", "event_id", "ts", n.alias("n"), corr.alias("roll_corr20")
    )


@register(
    "q_events_seasonality",
    oracle="""
        WITH profile AS (
            SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value) AS expected,
                   COUNT(*) AS n_in_cell
            FROM events GROUP BY 1, 2
        )
        SELECT e.event_id, e.event_type,
               CAST(EXTRACT(hour FROM e.ts) AS INT) AS hod,
               e.value, p.expected, p.n_in_cell,
               e.value - p.expected AS residual
        FROM events e
        JOIN profile p
          ON p.event_type = e.event_type
         AND p.hod = CAST(EXTRACT(hour FROM e.ts) AS INT)
    """,
    doc=(
        "Diurnal seasonality decomposition: the (event_type, hour-of-"
        "day) mean profile (decimal-exact), joined back to score every "
        "observation's residual against its seasonal expectation — the "
        "de-seasonalized anomaly input. The profile is a tiny "
        "broadcastable aggregate (types x 24 cells) regardless of fact "
        "size, so the join adds no shuffle at any scale."
    ),
    tags=("timeseries", "stats"),
)
def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hod = F.hour("ts").alias("hod")
    profile = e.groupBy("event_type", hod).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("value")).alias(
            "expected"
        ),
        F.count("*").alias("n_in_cell"),
    )
    return (
        e.select("event_id", "event_type", hod, "value")
        .join(F.broadcast(profile), ["event_type", "hod"])
        .select(
            "event_id",
            "event_type",
            "hod",
            "value",
            "expected",
            "n_in_cell",
            (F.col("value") - F.col("expected")).alias("residual"),
        )
    )


@register(
    "q_events_anomaly_mad",
    oracle="""
        WITH med AS (
            SELECT event_type, median(value) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_id, e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS absdev
            FROM events e JOIN med m ON m.event_type = e.event_type
        ),
        mad AS (
            SELECT event_type, median(absdev) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
               (abs(d.value - d.med) > 3 * 1.4826 * m.mad) AS is_outlier
        FROM dev d JOIN mad m ON m.event_type = d.event_type
    """,
    doc=(
        "Robust outlier detection via median absolute deviation: per-"
        "type median, then the median of absolute deviations, flagging "
        "|x - med| > 3 * 1.4826 * MAD — immune to the outliers that "
        "inflate the z-score variant's own stddev "
        "(q_events_anomaly_zscore). Two grouped exact-median passes "
        "(both engines interpolate identically), stats broadcast back; "
        "per-row double arithmetic is deterministic."
    ),
    tags=("timeseries", "stats", "anomaly"),
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("absdev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("absdev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            "med",
            "mad",
            (F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")).alias(
                "is_outlier"
            ),
        )
    )
