"""Wave-66 operator (round 9): video shot-boundary detection over the
frame fan-out — the temporal-segmentation member of the multimodal
family (frame sampling = extraction, Goertzel/centroid = audio
features, ahash/dhash/phash = image dedup; this is the video cut
detector).

``q_multimodal_shot_boundaries``: every payload's consecutive 32-byte
frames (stride 1 — the wave-4 frame fan-out at full rate) reduce to an
exact integer intensity (byte sum) inside one Arrow-batched kernel; a
shot BOUNDARY fires at frame f iff the inter-frame change is an
outlier against the clip's own activity:

    |delta_f| * n_deltas > K * sum(|delta|)        (K = 3)

— the standard adaptive-threshold pixel/histogram-difference detector
(Zhang et al. 1993) with the threshold comparison CROSS-MULTIPLIED so
the whole decision is exact integer arithmetic (no mean, no division).
Output one row per clip: n_frames, n_boundaries, n_shots
(= boundaries + 1), max_abs_delta — the shot-structure summary a
video-curation pipeline filters on (0 shots = static/junk, hundreds =
strobing).

Scale: the feature pass is a narrow mapInPandas fan-out (no shuffle,
binary never crosses an exchange); deltas ride a lag window
PARTITIONED by doc_id; the rollup is one partial-aggregated groupBy.
A real decoder swaps the byte-sum kernel for decoded-luma histograms;
plumbing, partitioning and the detector are unchanged.

Oracle: the payload is UTF-8 of the (pure-ASCII) text, so DuckDB
replays frame intensities with ascii() over 32-char slices, the lag
deltas, the cross-multiplied rule, and the rollup in exact integer
SQL.

Reference parity note: the reference processes no media (empty plan
body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_FRAME = 32
_K = 3  # adaptive-threshold multiplier


def _shot_oracle() -> str:
    return f"""
        WITH t AS (
            SELECT doc_id, text, strlen(text) // {_FRAME} AS n_frames
            FROM documents
        ),
        fr AS (
            SELECT doc_id, n_frames,
                   UNNEST(range(0, n_frames)) AS frame_idx, text
            FROM t WHERE n_frames > 0
        ),
        intens AS (
            SELECT doc_id, n_frames, frame_idx,
                   CAST(list_sum(list_transform(
                       range(0, {_FRAME}),
                       i -> ascii(text[CAST(frame_idx * {_FRAME} + i
                                            AS INTEGER) + 1])
                   )) AS BIGINT) AS intensity
            FROM fr
        ),
        deltas AS (
            SELECT doc_id, n_frames, frame_idx,
                   ABS(intensity - LAG(intensity) OVER (
                       PARTITION BY doc_id ORDER BY frame_idx ASC)) AS ad
            FROM intens
        ),
        tot AS (
            SELECT doc_id,
                   CAST(COUNT(ad) AS BIGINT) AS n_deltas,
                   CAST(COALESCE(SUM(ad), 0) AS BIGINT) AS sum_ad,
                   CAST(COALESCE(MAX(ad), 0) AS BIGINT) AS max_ad,
                   CAST(MAX(n_frames) AS BIGINT) AS n_frames
            FROM deltas GROUP BY doc_id
        ),
        b AS (
            SELECT d.doc_id,
                   CAST(COALESCE(SUM(CASE WHEN d.ad * t.n_deltas
                                               > {_K} * t.sum_ad
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_boundaries
            FROM deltas d JOIN tot t ON t.doc_id = d.doc_id
            WHERE d.ad IS NOT NULL
            GROUP BY d.doc_id
        )
        SELECT t.doc_id, t.n_frames,
               CAST(COALESCE(b.n_boundaries, 0) AS BIGINT) AS n_boundaries,
               CAST(COALESCE(b.n_boundaries, 0) + 1 AS BIGINT) AS n_shots,
               t.max_ad AS max_abs_delta
        FROM tot t LEFT JOIN b ON b.doc_id = t.doc_id
    """


@register(
    "q_multimodal_shot_boundaries",
    oracle=_shot_oracle(),
    doc=(
        "Video shot-boundary detection (r9) — the temporal-"
        "segmentation multimodal member: stride-1 frame intensities "
        "(exact byte sums in one Arrow kernel), boundary iff "
        "|delta|*n_deltas > 3*sum|delta| (the adaptive-threshold "
        "frame-difference detector, cross-multiplied so the decision "
        "is exact integer arithmetic), one summary row per clip "
        "(n_frames, n_boundaries, n_shots, max_abs_delta). Narrow "
        "fan-out, doc-partitioned lag window, one rollup groupBy; a "
        "real decoder swaps the byte-sum kernel for luma histograms "
        "without touching plumbing. Oracle replays frames, deltas, "
        "rule and rollup in integer SQL."
    ),
    tags=("multimodal", "video", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_shot_boundaries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from weather_flink_spark.operators.multimodal import (
        attach_payload,
        frame_intensities,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    intens = frame_intensities(attach_payload(d), frame_size=_FRAME)
    w = Window.partitionBy("doc_id").orderBy(F.col("frame_idx").asc())
    deltas = intens.select(
        "doc_id",
        "frame_idx",
        F.abs(F.col("intensity") - F.lag("intensity").over(w)).alias("ad"),
    )
    tot = deltas.groupBy("doc_id").agg(
        F.count("ad").cast("bigint").alias("n_deltas"),
        F.coalesce(F.sum("ad"), F.lit(0)).cast("bigint").alias("sum_ad"),
        F.coalesce(F.max("ad"), F.lit(0)).cast("bigint").alias("max_abs_delta"),
        (F.count("*")).cast("bigint").alias("n_frames"),
    )
    b = (
        deltas.join(
            tot.select("doc_id", "n_deltas", "sum_ad"), "doc_id"
        )
        .filter(F.col("ad").isNotNull())
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ad") * F.col("n_deltas")
                        > F.lit(_K) * F.col("sum_ad"),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).cast("bigint").alias("n_boundaries")
        )
    )
    return tot.join(b, "doc_id", "left").select(
        "doc_id",
        "n_frames",
        F.coalesce(F.col("n_boundaries"), F.lit(0).cast("bigint")).alias(
            "n_boundaries"
        ),
        (
            F.coalesce(F.col("n_boundaries"), F.lit(0).cast("bigint"))
            + F.lit(1)
        ).cast("bigint").alias("n_shots"),
        "max_abs_delta",
    )
