"""Wave-69 operators (round 9): embedding isotropy + cross-source
vocabulary overlap — two corpus-geometry diagnostics.

- ``q_emb_isotropy`` — the mean-resultant-length isotropy measure
  over the UNIT-normalized embedding corpus (directional statistics:
  R_bar = |mean of unit vectors|; 0 = perfectly isotropic directions,
  1 = all vectors collinear; the Ethayarajh-style anisotropy check an
  embedding-QA pass runs before trusting cosine retrieval). Every
  SURVEY/verdict note since r6 has CLAIMED this corpus is
  "near-isotropic" to explain recall ceilings and cell-miss rates —
  this entry finally MEASURES the claim (and the test pins it:
  R_bar << 1). Exactness: unit components are identical IEEE doubles
  on both engines (shared fold kernels), their per-dimension sums go
  through DECIMAL(18,9) (the q_emb_dimension_stats convention), and
  the final R_bar squares/sums the 64 per-dim means in DECIMAL before
  one sqrt.

- ``q_text_source_vocab_jaccard`` — pairwise Jaccard similarity of
  the distinct-token vocabularies of every source pair (the
  corpus-composition diagnostic behind dedup/mixing decisions:
  near-identical vocabularies = candidate source merge; disjoint =
  domain diversity). |sources| is bounded, so the pair table is a
  bounded rollup of one distinct (source, token) table — intersection
  by token-keyed self-join, union by inclusion-exclusion, never
  doc x doc.

Scale: both are partial-aggregated groupBys over exploded columns
with bounded outputs (64 rows of state folded to 1; |sources|^2/2
rows).

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


def _isotropy_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import _NORM_DUCK

    nrm = _NORM_DUCK.format(v="embedding")
    return f"""
        WITH u AS (
            SELECT UNNEST(range(1, len(embedding) + 1)) - 1 AS pos,
                   UNNEST(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) / {nrm})) AS uc
            FROM embeddings
        ),
        dimsums AS (
            SELECT pos,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(uc AS DECIMAL(18,9))) AS DOUBLE) AS sum_u
            FROM u GROUP BY pos
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_vectors,
               CAST(COUNT(*) AS BIGINT) AS dims,
               SQRT(CAST(SUM(
                   CAST(sum_u / CAST(n AS DOUBLE) AS DECIMAL(12,9))
                   * CAST(sum_u / CAST(n AS DOUBLE) AS DECIMAL(12,9))
               ) AS DOUBLE)) AS r_bar,
               MAX(ABS(sum_u / CAST(n AS DOUBLE))) AS max_abs_mean
        FROM dimsums
    """


@register(
    "q_emb_isotropy",
    oracle=_isotropy_oracle(),
    doc=(
        "Embedding isotropy via the mean resultant length of the "
        "unit-normalized corpus (r9, directional statistics): R_bar = "
        "|mean unit vector| — 0 is perfectly isotropic, 1 collinear; "
        "the embedding-QA check run before trusting cosine retrieval. "
        "Finally MEASURES the 'near-isotropic corpus' claim every "
        "recall analysis since r6 has leaned on (test pins R_bar << "
        "1). Unit components are identical IEEE doubles on both "
        "engines; per-dim sums ride DECIMAL(18,9); the 64 squared "
        "means fold in DECIMAL before one sqrt. One explode + two "
        "bounded aggregates."
    ),
    tags=("similarity", "stats", "evaluation", "diagnostics"),
)
def q_emb_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import norm_col

    e = load(spark, sf_dir, "embeddings")
    nrm = norm_col(F.col("embedding"))
    unit = F.transform(
        F.col("embedding"), lambda x: x.cast("double") / nrm
    )
    u = e.select(F.posexplode(unit).alias("pos", "uc"))
    dimsums = u.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.sum(F.col("uc").cast("decimal(18,9)")).cast("double").alias("sum_u"),
    )
    mean_u = F.col("sum_u") / F.col("n").cast("double")
    md = mean_u.cast("decimal(12,9)")
    return dimsums.agg(
        F.max("n").cast("bigint").alias("n_vectors"),
        F.count("*").cast("bigint").alias("dims"),
        F.sqrt(F.sum(md * md).cast("double")).alias("r_bar"),
        F.max(F.abs(mean_u)).alias("max_abs_mean"),
    )


@register(
    "q_text_source_vocab_jaccard",
    oracle="""
        WITH st AS (
            SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS t
            FROM documents
        ),
        sizes AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM st
            GROUP BY source
        ),
        inter AS (
            SELECT a.source AS s1, b.source AS s2,
                   CAST(COUNT(*) AS BIGINT) AS n_inter
            FROM st a JOIN st b ON b.t = a.t AND b.source > a.source
            GROUP BY a.source, b.source
        )
        SELECT i.s1, i.s2, i.n_inter,
               (za.v + zb.v - i.n_inter) AS n_union,
               CAST(i.n_inter AS DOUBLE)
                   / CAST(za.v + zb.v - i.n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes za ON za.source = i.s1
        JOIN sizes zb ON zb.source = i.s2
    """,
    doc=(
        "Pairwise Jaccard similarity of per-source distinct-token "
        "vocabularies (r9) — the corpus-composition diagnostic behind "
        "source merge/mix decisions. One distinct (source, token) "
        "table; intersections via a token-keyed self-join (s2 > s1), "
        "unions by inclusion-exclusion — bounded |sources|^2/2 output, "
        "never doc x doc; exact integers until the final division."
    ),
    tags=("text", "dedup", "llm-pipeline", "diagnostics"),
)
def q_text_source_vocab_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    st = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).distinct()
    sizes = st.groupBy("source").agg(F.count("*").cast("bigint").alias("v"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(
            b,
            (F.col("b.t") == F.col("a.t"))
            & (F.col("b.source") > F.col("a.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    za = sizes.select(F.col("source").alias("s1"), F.col("v").alias("va"))
    zb = sizes.select(F.col("source").alias("s2"), F.col("v").alias("vb"))
    uni = F.col("va") + F.col("vb") - F.col("n_inter")
    return (
        inter.join(F.broadcast(za), "s1")
        .join(F.broadcast(zb), "s2")
        .select(
            "s1",
            "s2",
            "n_inter",
            uni.alias("n_union"),
            (F.col("n_inter").cast("double") / uni.cast("double")).alias(
                "jaccard"
            ),
        )
    )
