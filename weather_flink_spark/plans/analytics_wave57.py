"""Wave-57 operator (round 9): audio near-dedup via an energy-gradient
hash over the real WAV/PCM fixtures — the audio half of the r8
verdict's stretch #8, completing the perceptual-dedup family (text
MinHash, image ahash+dhash, now audio).

``q_multimodal_audio_dedup_energyhash``: every document's genuine
RIFF/WAVE payload (the wave-22 fixture rule — rate = 8000 + doc_id%4 *
4000, samples = the UTF-8 text bytes) is hashed by
operators/multimodal.wav_energyhash: the PCM stream splits into 33
fixed frames and bit f compares adjacent frames' MEAN energies exactly
by integer cross-multiplication (``sum(f+1)*cnt(f) > sum(f)*cnt(f+1)``)
— 32 gradient bits, the audio sibling of the image dHash (local
temporal structure, robust to level shifts since only orderings
matter). Near-dup candidates come from 4 bands of 8 bits blocked on
sample_rate (pigeonhole: Hamming <= 3 => some band collides), verified
pairs roll up to a per-clip verdict — the exact _band_dedup pipeline
the image tiers ride (analytics_wave52), with the audio block key.

At 100 TB: 4 bytes of code per clip is the persisted index; the band
join shuffles on (rate, band, bits) — never clip x clip; the framing
pass is one mapInPandas over the payload column.

Oracle: the WAV payload is a deterministic function of (doc_id, text),
so DuckDB replays sample extraction (ascii over the text's chars — the
fixture corpus is ASCII by construction, same reliance as the BMP
oracle), exact frame boundaries (f*n//33), the cross-multiplied
gradient bits, bands, pigeonhole join, and rollup in pure integer SQL,
while the Spark side hashes the real container bytes (wave-15 decode
discipline).

Reference parity note: the reference processes no media (empty plan
body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with family modules)

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_EHASH_T = 3  # max Hamming distance for a near-dup verdict
_N_BANDS = 4
_BAND_BITS = 8  # 4 x 8 covers the 32 gradient bits


def _ehash_cte() -> str:
    """DuckDB CTE ``eh`` (doc_id, sample_rate, n_samples, ehash):
    replay of the energy-gradient hash from the fixture rule."""
    from weather_flink_spark.operators.multimodal import EHASH_N_FRAMES

    nf = EHASH_N_FRAMES
    return f"""
        smp AS (
            SELECT doc_id,
                   8000 + doc_id % 4 * 4000 AS sample_rate,
                   length(text) AS n,
                   list_transform(range(1, length(text) + 1),
                                  j -> ascii(text[CAST(j AS INTEGER)])) AS iv
            FROM documents
        ),
        frames AS (
            SELECT doc_id, sample_rate, n,
                   list_transform(range(0, {nf}), f ->
                       COALESCE(list_sum(iv[
                           CAST(f * n // {nf} + 1 AS INTEGER)
                           : CAST((f + 1) * n // {nf} AS INTEGER)]), 0)
                   ) AS s,
                   list_transform(range(0, {nf}), f ->
                       (f + 1) * n // {nf} - f * n // {nf}) AS c
            FROM smp
        ),
        eh AS MATERIALIZED (
            SELECT doc_id, sample_rate, n AS n_samples,
                   CAST(COALESCE(list_sum(list_transform(
                       range(0, {nf - 1}),
                       f -> CASE WHEN s[CAST(f AS INTEGER) + 2]
                                      * c[CAST(f AS INTEGER) + 1]
                                      > s[CAST(f AS INTEGER) + 1]
                                      * c[CAST(f AS INTEGER) + 2]
                            THEN CAST(1 AS BIGINT) << CAST(f AS INTEGER)
                            ELSE 0 END)), 0) AS BIGINT) AS ehash
            FROM frames
        )"""


def _audio_dedup_oracle() -> str:
    bands = ", ".join(f"({b})" for b in range(_N_BANDS))
    return f"""
        WITH {_ehash_cte()},
        banded AS (
            SELECT a.doc_id, a.sample_rate, a.ehash, b.b,
                   (a.ehash >> (b.b * {_BAND_BITS})) & {2 ** _BAND_BITS - 1}
                       AS band_key
            FROM eh a JOIN (VALUES {bands}) b(b) ON TRUE
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
                   CAST(bit_count(xor(x.ehash, y.ehash)) AS INTEGER)
                       AS hamming
            FROM banded x
            JOIN banded y
              ON y.sample_rate = x.sample_rate
             AND y.b = x.b AND y.band_key = x.band_key
             AND y.doc_id > x.doc_id
            WHERE CAST(bit_count(xor(x.ehash, y.ehash)) AS INTEGER)
                      <= {_EHASH_T}
        ),
        sided AS (
            SELECT id1 AS doc_id, id2 AS partner, hamming FROM cand
            UNION ALL
            SELECT id2 AS doc_id, id1 AS partner, hamming FROM cand
        ),
        rolled AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_neardups,
                   MAX(CASE WHEN rk = 1 THEN partner END) AS best_match_id,
                   MAX(CASE WHEN rk = 1 THEN hamming END) AS best_hamming
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id
                    ORDER BY hamming ASC, partner ASC) AS rk
                FROM sided
            ) GROUP BY doc_id
        )
        SELECT a.doc_id, a.sample_rate, a.ehash,
               COALESCE(r.n_neardups, 0) AS n_neardups,
               r.best_match_id,
               CAST(r.best_hamming AS INTEGER) AS best_hamming
        FROM eh a LEFT JOIN rolled r ON r.doc_id = a.doc_id
    """


@register(
    "q_multimodal_audio_dedup_energyhash",
    oracle=_audio_dedup_oracle(),
    doc=(
        "Audio near-dedup via a 32-bit energy-gradient hash over REAL "
        "RIFF/WAVE bytes (r9, r8 verdict stretch #8 audio half): the "
        "PCM stream splits into 33 fixed frames, bit f = frame f+1's "
        "mean energy strictly exceeds frame f's (exact integer "
        "cross-multiplication — level-shift-robust local temporal "
        "structure, the audio sibling of the image dHash); 4x8-bit "
        "LSH bands blocked on sample_rate (pigeonhole-complete at "
        "Hamming <= 3), verified pairs roll to a per-clip verdict via "
        "the shared _band_dedup pipeline. At 100 TB: 4 bytes/clip "
        "persisted index, band-join shuffle, never clip x clip. "
        "Oracle replays framing, gradients, bands, join and rollup "
        "from the fixture's deterministic (doc_id, text) byte rule."
    ),
    tags=("multimodal", "dedup", "lsh", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_audio_dedup_energyhash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from weather_flink_spark.operators.multimodal import (
        encode_wav_payload,
        energyhash_frame,
    )
    from weather_flink_spark.plans.analytics_wave52 import _band_dedup

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    eh = energyhash_frame(encode_wav_payload(d)).select(
        "doc_id", "sample_rate", "ehash"
    )
    return _band_dedup(
        spark,
        eh,
        "ehash",
        block_cols=("sample_rate",),
        band_bits=_BAND_BITS,
        threshold=_EHASH_T,
    )


def _union_oracle() -> str:
    """Compose the four tiers' FULL oracle replays as WITH-subqueries
    (each carries its own CTE chain, so names never collide)."""
    from weather_flink_spark.plans.analytics_wave52 import (
        _dedup_oracle,
        _dhash_cte,
    )
    from weather_flink_spark.plans.analytics_wave59 import _phash_oracle

    ah = _dedup_oracle()
    dh = _dedup_oracle(tbl="dh", col="dhash", extra_cte="," + _dhash_cte())
    phh = _phash_oracle()
    au = _audio_dedup_oracle()
    return f"""
        SELECT a.doc_id,
               (a.best_match_id IS NOT NULL) AS image_ahash_hit,
               (d.best_match_id IS NOT NULL) AS image_dhash_hit,
               (p.best_match_id IS NOT NULL) AS image_phash_hit,
               (au.best_match_id IS NOT NULL) AS audio_hit,
               CAST((CASE WHEN a.best_match_id IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN d.best_match_id IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN p.best_match_id IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN au.best_match_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS INTEGER) AS n_tiers_flagging
        FROM (WITH {ah.strip().removeprefix("WITH")}) a
        JOIN (WITH {dh.strip().removeprefix("WITH")}) d ON d.doc_id = a.doc_id
        JOIN (WITH {phh.strip().removeprefix("WITH")}) p ON p.doc_id = a.doc_id
        JOIN (WITH {au.strip().removeprefix("WITH")}) au ON au.doc_id = a.doc_id
    """


@register(
    "q_multimodal_dedup_union",
    oracle=_union_oracle(),
    doc=(
        "Cross-tier near-dup UNION verdict (r9): one row per document "
        "with each perceptual tier's flag (image average-hash, image "
        "difference-hash, image DCT pHash, audio energy-hash) and the "
        "count of tiers flagging it — the production pattern the "
        "union-recall test proves (each tier finds structure the "
        "others miss: fixture 243/292/6 matched docs for "
        "ahash/dhash/audio, union 409+; the wave-59 phash tier adds "
        "frequency structure). A curation pipeline keeps a doc only "
        "when 0 tiers flag it, or routes 1-vs-many flags to different "
        "review queues. Scale: four independent band-LSH verdict "
        "pipelines joined on doc_id — each is hash-scan linear + "
        "collision-bounded; the join is one doc_id-keyed shuffle. "
        "Oracle composes the four tiers' FULL replays as "
        "WITH-subqueries (no CTE-name collisions)."
    ),
    tags=("multimodal", "dedup", "lsh", "llm-pipeline"),
)
def q_multimodal_dedup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave52 import (
        q_multimodal_image_dedup_ahash,
        q_multimodal_image_dedup_dhash,
    )

    ah = q_multimodal_image_dedup_ahash(spark, sf_dir).select(
        "doc_id", F.col("best_match_id").isNotNull().alias("image_ahash_hit")
    )
    dh = q_multimodal_image_dedup_dhash(spark, sf_dir).select(
        "doc_id", F.col("best_match_id").isNotNull().alias("image_dhash_hit")
    )
    from weather_flink_spark.plans.analytics_wave59 import (
        q_multimodal_image_dedup_phash,
    )

    phh = q_multimodal_image_dedup_phash(spark, sf_dir).select(
        "doc_id", F.col("best_match_id").isNotNull().alias("image_phash_hit")
    )
    au = q_multimodal_audio_dedup_energyhash(spark, sf_dir).select(
        "doc_id", F.col("best_match_id").isNotNull().alias("audio_hit")
    )
    return (
        ah.join(dh, "doc_id")
        .join(phh, "doc_id")
        .join(au, "doc_id")
        .select(
            "doc_id",
            "image_ahash_hit",
            "image_dhash_hit",
            "image_phash_hit",
            "audio_hit",
            (
                F.col("image_ahash_hit").cast("int")
                + F.col("image_dhash_hit").cast("int")
                + F.col("image_phash_hit").cast("int")
                + F.col("audio_hit").cast("int")
            ).cast("int").alias("n_tiers_flagging"),
        )
    )
