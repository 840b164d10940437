"""Wave-23 operators (round 4): one-way ANOVA, clustering silhouette,
and compression-ratio quality signals.

- ``q_stats_anova`` — one-way ANOVA F-test across event types: the
  between/within variance decomposition from exact DECIMAL moments —
  the k-group generalization of the engine's two-sample Welch test.
- ``q_emb_silhouette`` — simplified silhouette score of the trained
  IVF/k-means partition (distance-to-centroid form: a(i) = d(i, own
  centroid), b(i) = min over other centroids): the index-quality audit
  that says whether the learned cells actually separate the corpus.
- ``q_text_compression_ratio`` — zlib compression ratio per document,
  the classic redundancy/quality signal (Gopher's repetition family):
  highly compressible text is boilerplate or looped spam. Rows-only:
  the DEFLATE byte stream is library-version-defined, so the contract
  is pinned by a local-zlib equality test instead of a SQL oracle.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``); these extend the north-star
surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# One-way ANOVA across event types
# ---------------------------------------------------------------------------


@register(
    "q_stats_anova",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                            AS DECIMAL(18,6))) AS s,
                   SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                            AS DECIMAL(12,6))
                       * CAST(ROUND(CAST(value AS DOUBLE), 6)
                              AS DECIMAL(12,6))) AS ss
            FROM events GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n) AS BIGINT) AS nt,
                   SUM(s) AS st, SUM(ss) AS sst
            FROM g
        ),
        comp AS (
            SELECT k, nt,
                   -- SSB = sum(s_i^2/n_i) - st^2/nt ; SSW = sst - sum(s_i^2/n_i)
                   (SELECT SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) FROM g)
                       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt AS ssb,
                   CAST(sst AS DOUBLE)
                       - (SELECT SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                          FROM g) AS ssw
            FROM tot
        )
        SELECT k AS n_groups, nt AS n_obs,
               ROUND(ssb, 6) AS ss_between,
               ROUND(ssw, 6) AS ss_within,
               CAST(k - 1 AS BIGINT) AS df_between,
               CAST(nt - k AS BIGINT) AS df_within,
               ROUND((ssb / (k - 1)) / (ssw / (nt - k)), 6) AS f_stat
        FROM comp
    """,
    doc=(
        "One-way ANOVA across event types — the k-group "
        "generalization of q_stats_welch_ttest: between/within sum-of-"
        "squares decomposition computed from exact DECIMAL moments "
        "(6dp-quantized inputs, one grouped pass + one 5-row rollup), "
        "then the F statistic MSB/MSW. A large F says the type means "
        "genuinely differ — the gate before any per-type treatment "
        "comparison. Parity: all order-sensitive sums are decimal; "
        "the float divisions happen once, on 5-row aggregates, "
        "identically structured on both engines."
    ),
    tags=("statistics", "experimentation", "agg"),
)
def q_stats_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v6 = F.round(F.col("value").cast("double"), 6)
    g = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(v6.cast("decimal(18,6)")).alias("s"),
        F.sum(v6.cast("decimal(12,6)") * v6.cast("decimal(12,6)")).alias("ss"),
    )
    comp = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        F.sum(
            F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        ).alias("sq_over_n"),
    )
    ssb = F.col("sq_over_n") - F.col("st").cast("double") * F.col("st").cast(
        "double"
    ) / F.col("nt")
    ssw = F.col("sst").cast("double") - F.col("sq_over_n")
    return comp.select(
        F.col("k").alias("n_groups"),
        F.col("nt").alias("n_obs"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        (F.col("k") - 1).cast("bigint").alias("df_between"),
        (F.col("nt") - F.col("k")).cast("bigint").alias("df_within"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("nt") - F.col("k"))), 6
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Simplified silhouette of the trained IVF partition
# ---------------------------------------------------------------------------


def _silhouette_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave4 import (
        KMEANS_ITERS,
        _kmeans_dist_duck,
    )
    from weather_flink_spark.plans.llm_extra import ivf_assigned_cte

    dist = _kmeans_dist_duck("a.embedding", "c.c")
    return f"""
        WITH {ivf_assigned_cte()},
        dists AS (
            SELECT a.vec_id, a.cell, c.cid,
                   SQRT({dist}) AS d
            FROM assigned a CROSS JOIN cent{KMEANS_ITERS} c
        ),
        ab AS (
            SELECT vec_id, cell,
                   MIN(CASE WHEN cid = cell THEN d END) AS a_own,
                   MIN(CASE WHEN cid <> cell THEN d END) AS b_other
            FROM dists GROUP BY vec_id, cell
        ),
        sil AS (
            SELECT vec_id, cell,
                   CAST(ROUND((b_other - a_own) / GREATEST(a_own, b_other),
                              9) AS DECIMAL(12,9)) AS s9
            FROM ab
        )
        SELECT cell,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               -- exact decimal sum / count (engines' AVG(DECIMAL)
               -- implementations differ in intermediate type)
               CAST(SUM(s9) AS DOUBLE) / COUNT(*) AS mean_silhouette,
               CAST(MIN(s9) AS DOUBLE) AS worst_silhouette
        FROM sil GROUP BY cell
    """


@register(
    "q_emb_silhouette",
    oracle=_silhouette_oracle(),
    doc=(
        "Simplified silhouette of the trained IVF/k-means partition "
        "(centroid-distance form, Hruschka et al.): per point, "
        "a = distance to its own learned centroid and b = distance to "
        "the nearest OTHER centroid, s = (b-a)/max(a,b); reported per "
        "cell as mean and worst silhouette — the index-quality audit "
        "that says whether the cells actually separate the corpus "
        "(s near 0 on this near-uniform synthetic corpus, strongly "
        "positive on clusterable data; points with negative s sit in "
        "the wrong cell). Rides the session-cached model: O(n·k) "
        "centroid distances, never pairwise. Parity: per-point s "
        "quantizes to 9 dp decimal before the exact decimal average."
    ),
    tags=("embedding", "ann", "ivf", "evaluation"),
)
def q_emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import (
        _kmeans_dist_col,
        kmeans_final_assignment,
    )
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table

    assigned = ivf_assigned_table(spark, sf_dir)
    cent, _ = kmeans_final_assignment(spark, sf_dir)
    d = F.sqrt(_kmeans_dist_col("embedding", "c"))
    dists = assigned.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cell", "cid", d.alias("d")
    )
    ab = dists.groupBy("vec_id", "cell").agg(
        F.min(F.when(F.col("cid") == F.col("cell"), F.col("d"))).alias(
            "a_own"
        ),
        F.min(F.when(F.col("cid") != F.col("cell"), F.col("d"))).alias(
            "b_other"
        ),
    )
    s9 = F.round(
        (F.col("b_other") - F.col("a_own"))
        / F.greatest(F.col("a_own"), F.col("b_other")),
        9,
    ).cast("decimal(12,9)")
    return (
        ab.select("vec_id", "cell", s9.alias("s9"))
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            (F.sum("s9").cast("double") / F.count("*")).alias(
                "mean_silhouette"
            ),
            F.min("s9").cast("double").alias("worst_silhouette"),
        )
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal
# ---------------------------------------------------------------------------


@register(
    "q_text_compression_ratio",
    doc=(
        "zlib compression ratio per document — the classic redundancy "
        "signal in corpus curation (the Gopher repetition family's "
        "information-theoretic cousin): highly compressible text is "
        "boilerplate, template spam or loops; near-incompressible text "
        "is often binary junk or hash dumps. Arrow-batched mapInPandas "
        "with Python's bundled zlib at level 6; flagged when the ratio "
        "leaves the [0.3, 0.9] healthy band. Rows-only: the DEFLATE "
        "byte stream is library-version-defined, so the contract is "
        "pinned by a local-zlib equality test (tests/"
        "test_analytics_wave23.py) instead of a SQL oracle. Scale: "
        "narrow map, one pass, no shuffle."
    ),
    tags=("text", "quality", "llm-pipeline", "pandas-udf"),
)
def q_text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    import zlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("raw_bytes", T.LongType()),
            T.StructField("compressed_bytes", T.LongType()),
            T.StructField("ratio", T.DoubleType()),
            T.StructField("flagged", T.BooleanType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                raw = text.encode("utf-8")
                comp = zlib.compress(raw, 6)
                ratio = round(len(comp) / len(raw), 6) if raw else 1.0
                rows.append(
                    (
                        int(doc_id),
                        len(raw),
                        len(comp),
                        ratio,
                        not (0.3 <= ratio <= 0.9),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "raw_bytes",
                    "compressed_bytes",
                    "ratio",
                    "flagged",
                ],
            )

    return d.mapInPandas(kernel, schema=schema)
