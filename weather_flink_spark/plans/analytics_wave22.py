"""Wave-22 operators (round 4): real WAV decode and single-changepoint
detection.

- ``q_multimodal_decode_wav`` — the engine's third REAL codec: each
  document's bytes become a genuine RIFF/WAVE file (canonical PCM fmt
  chunk + data chunk), and the Arrow-batched parser walks the chunk
  list like a real reader (fmt/data in any order, even-length padding)
  to recover sample rate, channel count, bit depth, sample count,
  duration and the integer-exact amplitude sum.
- ``q_events_changepoint`` — binary-segmentation changepoint (single
  split): per event type, the hour t* maximizing the CUSUM deviation
  |S_t − (t/n)·S_n| over the dense hourly count series, with
  before/after means and the level shift — the first split of the
  classic binary-segmentation recursion, and the localization step
  that follows a q_events_cusum alarm.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``); these extend the north-star
surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Real WAV decode
# ---------------------------------------------------------------------------


@register(
    "q_multimodal_decode_wav",
    oracle="""
        WITH s AS (
            SELECT doc_id,
                   8000 + (doc_id % 4) * 4000 AS rate,
                   length(text) AS n,
                   CAST(list_sum(list_transform(range(1, length(text) + 1),
                        i -> ascii(text[CAST(i AS INTEGER)]))) AS BIGINT)
                       AS byte_sum
            FROM documents
        )
        SELECT doc_id,
               CAST(rate AS BIGINT) AS sample_rate,
               CAST(1 AS BIGINT) AS channels,
               CAST(8 AS BIGINT) AS bits,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
               byte_sum
        FROM s
    """,
    doc=(
        "REAL audio-container decode (the engine's third genuine codec "
        "after BMP and raw PCM): each document's UTF-8 bytes are "
        "wrapped into a valid RIFF/WAVE file (canonical 16-byte PCM "
        "fmt chunk — mono, 8-bit, rate derived from doc_id — plus a "
        "data chunk), and the Arrow-batched parser walks the chunk "
        "list the way a real reader must (chunks in any order, "
        "even-length padding honored) to recover rate / channels / "
        "bits / sample count, the integer duration and the exact "
        "amplitude sum. The oracle replays the closed-form byte "
        "arithmetic. Scale: encode+decode is one narrow mapInPandas; "
        "payload bytes never shuffle."
    ),
    tags=("multimodal", "binary", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from weather_flink_spark.operators.multimodal import wav_encode, wav_parse

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sample_rate", T.LongType()),
            T.StructField("channels", T.LongType()),
            T.StructField("bits", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("byte_sum", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                rate = 8000 + int(doc_id) % 4 * 4000
                blob = wav_encode(rate, text.encode("utf-8"))
                parsed = wav_parse(blob)
                if parsed is None:
                    rows.append((int(doc_id), None, None, None, None, None, None))
                    continue
                sr, ch, bits, n, bsum = parsed
                rows.append(
                    (int(doc_id), sr, ch, bits, n, n * 1000 // sr, bsum)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "channels",
                    "bits",
                    "n_samples",
                    "duration_ms",
                    "byte_sum",
                ],
            )

    return d.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Single-changepoint detection (binary segmentation, first split)
# ---------------------------------------------------------------------------


@register(
    "q_events_changepoint",
    oracle="""
        WITH hc AS (
            SELECT event_type,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hr,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) AS h0,
                   MAX(CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) AS h1
            FROM events
        ),
        dense AS (
            SELECT t.event_type, g.hr, COALESCE(hc.cnt, 0) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY t.event_type ORDER BY g.hr) AS t_idx
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT UNNEST(range(h0, h1 + 1)) AS hr FROM bounds) g
            LEFT JOIN hc ON hc.event_type = t.event_type AND hc.hr = g.hr
        ),
        cum AS (
            SELECT event_type, hr, t_idx,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY t_idx) AS st,
                   SUM(c) OVER (PARTITION BY event_type) AS sn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM dense
        ),
        scored AS (
            -- integer-exact |n*S_t - t*S_n| (the CUSUM deviation scaled
            -- by n, so no division happens before the argmax)
            SELECT event_type, hr, t_idx, st, sn, n,
                   ABS(n * st - t_idx * sn) AS dev
            FROM cum WHERE t_idx < n
        ),
        best AS (
            SELECT event_type, hr, t_idx, st, sn, n, dev FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY event_type
                    ORDER BY dev DESC, t_idx ASC) AS rk
                FROM scored
            ) WHERE rk = 1
        )
        SELECT event_type,
               hr AS split_hr,
               t_idx AS split_idx,
               n AS n_hours,
               ROUND(CAST(st AS DOUBLE) / t_idx, 6) AS mean_before,
               ROUND(CAST(sn - st AS DOUBLE) / (n - t_idx), 6) AS mean_after,
               ROUND(CAST(sn - st AS DOUBLE) / (n - t_idx)
                     - CAST(st AS DOUBLE) / t_idx, 6) AS level_shift
        FROM best
    """,
    doc=(
        "Binary-segmentation changepoint (first split) per event type: "
        "the hour maximizing the CUSUM deviation |S_t - (t/n)S_n| over "
        "the dense hourly count series, reported with before/after "
        "means and the level shift — the localization step that "
        "follows a q_events_cusum alarm, and the first recursion of "
        "the classic binary-segmentation detector. Parity: the argmax "
        "compares the INTEGER quantity |n*S_t - t*S_n| (the deviation "
        "scaled by n), so split selection involves no floats at all; "
        "only the reported means divide, 6dp-rounded. Scale: one "
        "per-type ordered window over the period-bounded hourly "
        "rollup; the fact table is touched once, map-side combined."
    ),
    tags=("timeseries", "statistics", "window"),
)
def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hidx = F.expr("cast(ts as long) div 3600")
    hc = e.groupBy("event_type", hidx.alias("hr")).agg(
        F.count("*").alias("cnt")
    )
    bounds = e.agg(F.min(hidx).alias("h0"), F.max(hidx).alias("h1"))
    grid = bounds.select(F.explode(F.sequence("h0", "h1")).alias("hr"))
    types = e.select("event_type").distinct()
    w_ord = Window.partitionBy("event_type").orderBy("hr")
    dense = (
        grid.crossJoin(F.broadcast(types))
        .join(hc, ["event_type", "hr"], "left")
        .select("event_type", "hr", F.coalesce("cnt", F.lit(0)).alias("c"))
        .withColumn("t_idx", F.row_number().over(w_ord))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("t_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = dense.select(
        "event_type",
        "hr",
        "t_idx",
        F.sum("c").over(w_cum).alias("st"),
        F.sum("c").over(w_all).alias("sn"),
        F.count("*").over(w_all).alias("n"),
    )
    scored = cum.filter(F.col("t_idx") < F.col("n")).withColumn(
        "dev",
        F.abs(F.col("n") * F.col("st") - F.col("t_idx") * F.col("sn")),
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.col("dev").desc(), F.col("t_idx").asc()
    )
    best = (
        scored.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
    )
    mean_before = F.col("st").cast("double") / F.col("t_idx")
    mean_after = (F.col("sn") - F.col("st")).cast("double") / (
        F.col("n") - F.col("t_idx")
    )
    return best.select(
        "event_type",
        F.col("hr").alias("split_hr"),
        F.col("t_idx").alias("split_idx"),
        F.col("n").alias("n_hours"),
        F.round(mean_before, 6).alias("mean_before"),
        F.round(mean_after, 6).alias("mean_after"),
        F.round(mean_after - mean_before, 6).alias("level_shift"),
    )
