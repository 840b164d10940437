"""Wave-39 operator (round 6, continued): Goertzel single-bin DFT over
the PCM audio path.

- ``q_multimodal_goertzel`` — tone detection on the raw-PCM multimodal
  payloads (the q_multimodal_pcm_features byte interpretation): the
  Goertzel algorithm evaluates ONE DFT bin's power in a single O(N)
  recursion (s_t = x_t + C·s_{t-1} − s_{t-2}, C = 2cos(ω)) — the
  standard embedded/DSP primitive for detecting a known frequency
  without an FFT, and no FFT library exists in this container. The
  trig constant is computed ONCE in Python (math.cos) and injected as
  the SAME literal into both plans, so neither engine evaluates a
  transcendental: the recursion is pure arithmetic with an identical
  constant, replayed bit-exactly by a recursive-CTE oracle (the
  Holt/Kalman distributed-sequential class — applyInPandas per
  document on the Spark side).

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_GZ_FREQ = 0.1  # normalized target frequency (cycles per sample)
# 2*cos(2*pi*f) computed ONCE here; repr() round-trips the exact double
_GZ_C = 2.0 * math.cos(2.0 * math.pi * _GZ_FREQ)


@register(
    "q_multimodal_goertzel",
    oracle=f"""
        WITH RECURSIVE s AS MATERIALIZED (
            SELECT doc_id,
                   list_transform(range(1, length(text) + 1),
                       i -> CASE WHEN ascii(text[CAST(i AS INTEGER)]) < 128
                                 THEN ascii(text[CAST(i AS INTEGER)])
                                 ELSE ascii(text[CAST(i AS INTEGER)]) - 256
                            END) AS pcm
            FROM documents
        ),
        meta AS MATERIALIZED (
            SELECT doc_id, CAST(len(pcm) AS BIGINT) AS n,
                   CAST(list_sum(list_transform(pcm, v -> v * v)) AS BIGINT)
                       AS energy
            FROM s
        ),
        rec(doc_id, t, s1, s2) AS (
            SELECT doc_id, 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
            FROM s
            UNION ALL
            SELECT r.doc_id, r.t + 1,
                   (CAST(s.pcm[CAST(r.t + 1 AS INTEGER)] AS DOUBLE)
                    + {_GZ_C!r} * r.s1) - r.s2,
                   r.s1
            FROM rec r
            JOIN s ON s.doc_id = r.doc_id
            WHERE r.t < len(s.pcm)
        ),
        fin AS (
            SELECT r.doc_id, m.n, m.energy, r.s1, r.s2
            FROM rec r JOIN meta m ON m.doc_id = r.doc_id
            WHERE r.t = m.n
        )
        SELECT doc_id, n AS n_samples, energy,
               ROUND((s1 * s1 + s2 * s2) - {_GZ_C!r} * s1 * s2, 6)
                   AS goertzel_power,
               ROUND(((s1 * s1 + s2 * s2) - {_GZ_C!r} * s1 * s2)
                     / CAST(energy AS DOUBLE), 9) AS tone_ratio
        FROM fin
    """,
    doc=(
        "Goertzel single-bin DFT power over the raw-PCM audio payloads "
        f"at normalized frequency {_GZ_FREQ} — tone detection without "
        "an FFT (none exists in this container; Goertzel is the "
        "standard O(N) DSP primitive for a known frequency). The "
        "2cos(ω) constant is computed ONCE in Python and injected as "
        "the SAME literal into both plans — neither engine evaluates "
        "a transcendental, so the recursion is pure IEEE arithmetic "
        "replayed bit-exactly by the recursive-CTE oracle. Spark side "
        "is the Holt/Kalman distributed-sequential class: "
        "applyInPandas per document, parallelism = |documents|, "
        "energy exact-integer. tone_ratio = power/energy is the "
        "dominance signal an audio-curation gate thresholds."
    ),
    tags=("multimodal", "binary", "dsp", "pandas-udf"),
)
def q_multimodal_goertzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            xs = [
                (b if b < 128 else b - 256)
                for b in (ord(ch) for ch in row.text)
            ]
            s1 = s2 = 0.0
            energy = 0
            for x in xs:
                energy += x * x
                s1, s2 = (float(x) + _GZ_C * s1) - s2, s1
            power = (s1 * s1 + s2 * s2) - _GZ_C * s1 * s2
            # raw doubles out of the kernel: python round() is
            # half-even, the engines' ROUND is half-up — round in the
            # PLAN (the repo-wide driver-side-rounding rule)
            out.append(
                (
                    int(row.doc_id),
                    len(xs),
                    energy,
                    power,
                    power / float(energy) if energy else None,
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "n_samples",
                "energy",
                "power_raw",
                "ratio_raw",
            ],
        )

    raw = d.repartition(32, "doc_id").mapInPandas(
        lambda it: (kernel(pdf) for pdf in it),
        schema="doc_id long, n_samples long, energy long,"
        " power_raw double, ratio_raw double",
    )
    return raw.select(
        "doc_id",
        "n_samples",
        "energy",
        F.round(F.col("power_raw"), 6).alias("goertzel_power"),
        F.round(F.col("ratio_raw"), 9).alias("tone_ratio"),
    )
