"""Wave-43 operators (round 7): binary quantization + Hamming rerank —
the FIFTH ANN searcher architecture.

- ``q_emb_binary_quantize`` — sign-bit binary quantization of the
  64-dim embeddings into TWO packed BIGINT words (bit d of the low
  word = dim d > 0, dims 32..63 in the high word): 16 bytes per
  vector instead of 256+, the compression behind production vector
  DBs' "binary quantization" tier. All bit math is integer
  shift/sum — engine-exact.
- ``q_sim_ann_binary_rerank`` — the searcher: an exhaustive HAMMING
  scan over the packed words (per comparison: two xor + two popcounts,
  a 32x cheaper scan than float cosine — the architecture's whole
  point; this is the flat baseline of the binary tier, as
  q_sim_cosine_topk is of the float tier) keeps the top-C=20
  candidates per query, which an EXACT cosine pass re-ranks to top-5.
  Everything is deterministic: Hamming asc / vec_id asc tie-break,
  then cosine desc / vec_id asc.
- ``q_sim_ann_binary_recall`` — recall@k against the shared exact
  ground truth (llm_extra.exact_topk_table), the fifth searcher gate
  alongside IVF / IVF+PQ / flat-graph / HNSW.

Scale: the packed scan moves 16 bytes/vector (fits ~6 G vectors per
TB), broadcasts the bounded query side, and at 100 TB composes with
cell blocking exactly like the PQ ADC scan (q_sim_ann_ivfpq) — the
flat variant here is the measured baseline of the tier, not the
deployment plan.

Parity discipline as plans/registry.py; reference parity note: the
reference implements no similarity search (empty plan body,
``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

_BQ_CAND = 20  # Hamming candidates per query fed to the exact rerank

# bit d of word w = (embedding[32w + d] > 0); Spark transform index is
# 0-based, DuckDB's is 1-based — both sides shift by the same physical
# dim offset. Sign test on the raw float is engine-exact.
_BQ_LO_SPARK = (
    "aggregate(transform(slice(embedding, 1, 32),"
    " (x, i) -> IF(cast(x as double) > 0d, shiftleft(1L, i), 0L)),"
    " 0L, (a, b) -> a + b)"
)
_BQ_HI_SPARK = (
    "aggregate(transform(slice(embedding, 33, 32),"
    " (x, i) -> IF(cast(x as double) > 0d, shiftleft(1L, i), 0L)),"
    " 0L, (a, b) -> a + b)"
)


def _bq_codes_cte() -> str:
    """DuckDB CTE ``bq`` (vec_id, b_lo, b_hi) — the oracle twin of the
    packed sign-bit codes (positional unnest + shift-sum)."""
    return """
        bq AS MATERIALIZED (
            SELECT vec_id,
                   CAST(SUM(CASE WHEN pos <= 32 AND CAST(v AS DOUBLE) > 0
                            THEN CAST(1 AS BIGINT) << (pos - 1)
                            ELSE 0 END) AS BIGINT) AS b_lo,
                   CAST(SUM(CASE WHEN pos > 32 AND CAST(v AS DOUBLE) > 0
                            THEN CAST(1 AS BIGINT) << (pos - 33)
                            ELSE 0 END) AS BIGINT) AS b_hi
            FROM (
                SELECT vec_id,
                       UNNEST(range(1, 65)) AS pos,
                       UNNEST(embedding) AS v
                FROM embeddings
            )
            GROUP BY vec_id
        )"""


def binary_codes_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached packed sign-bit codes (vec_id, b_lo, b_hi,
    embedding, nrm) — 16 bytes of code per vector, kept beside the
    float vector for the exact rerank stage."""
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build() -> DataFrame:
        res = (
            ivf_assigned_table(spark, sf_dir)
            .select(
                "vec_id",
                "embedding",
                "nrm",
                F.expr(_BQ_LO_SPARK).alias("b_lo"),
                F.expr(_BQ_HI_SPARK).alias("b_hi"),
            )
            .persist()
        )
        res.count()
        return res

    return _cached("bq_codes", spark, sf_dir, build)


@register(
    "q_emb_binary_quantize",
    oracle=f"""
        WITH {_bq_codes_cte()}
        SELECT vec_id, b_lo, b_hi,
               bit_count(b_lo) + bit_count(b_hi) AS n_pos_dims
        FROM bq
    """,
    doc=(
        "Sign-bit binary quantization: each 64-dim embedding packs "
        "into TWO BIGINT words (bit d = dim d > 0) — 16 bytes per "
        "vector, the memory tier production vector stores scan before "
        "any float is touched. Pure integer shift/sum on both engines "
        "(Spark transform/aggregate lambda, oracle positional unnest); "
        "n_pos_dims = popcount sanity column (~32 on this centered "
        "corpus). Scale: 6 G vectors/TB; the scan-side consumer is "
        "q_sim_ann_binary_rerank."
    ),
    tags=("embeddings", "quantization", "similarity"),
)
def q_emb_binary_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = binary_codes_table(spark, sf_dir)
    return codes.select(
        "vec_id",
        "b_lo",
        "b_hi",
        (F.bit_count("b_lo") + F.bit_count("b_hi")).alias("n_pos_dims"),
    )


def _binary_rerank_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        IVF_TOP_K,
        _cos_duck,
    )

    return f"""
        WITH {_bq_codes_cte()},
        ham AS (
            SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                   bit_count(xor(q.b_lo, v.b_lo))
                   + bit_count(xor(q.b_hi, v.b_hi)) AS hamming
            FROM bq q JOIN bq v ON v.vec_id <> q.vec_id
            WHERE q.vec_id < {IVF_N_QUERIES}
        ),
        cand AS (
            SELECT query_id, vec_id, hamming FROM (
                SELECT query_id, vec_id, hamming,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY hamming ASC, vec_id ASC) AS rk
                FROM ham
            ) WHERE rk <= {_BQ_CAND}
        )
        SELECT query_id, vec_id, hamming, cosine, k_rank FROM (
            SELECT c.query_id, c.vec_id, c.hamming,
                   {_cos_duck('q.embedding', 'v.embedding')} AS cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                c.vec_id ASC) AS k_rank
            FROM cand c
            JOIN embeddings q ON q.vec_id = c.query_id
            JOIN embeddings v ON v.vec_id = c.vec_id
        ) WHERE k_rank <= {IVF_TOP_K}
    """


@register(
    "q_sim_ann_binary_rerank",
    oracle=_binary_rerank_oracle(),
    doc=(
        "Binary-quantization ANN (the fifth searcher architecture): "
        "exhaustive Hamming scan over 16-byte packed sign-bit codes "
        "(two xor + two popcounts per comparison — 32x less data "
        "movement than a float scan, the tier's whole point) keeps "
        "top-20 candidates per query; an exact float-cosine pass "
        "reranks them to top-5. Deterministic tie-breaks on both "
        "stages; the oracle replays codes, scan and rerank. Scale: "
        "broadcast the bounded query side; at 100 TB the bit scan "
        "composes with IVF cell blocking exactly like the PQ ADC "
        "path — this flat form is the tier's measured baseline."
    ),
    tags=("similarity", "ann", "quantization", "llm-pipeline"),
)
def q_sim_ann_binary_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "bq_result", spark, sf_dir, lambda: _binary_search(spark, sf_dir)
    )


def _binary_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES, IVF_TOP_K
    from weather_flink_spark.plans.llm_pipeline import dot_col

    codes = binary_codes_table(spark, sf_dir)
    q = codes.filter(F.col("vec_id") < IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("b_lo").alias("q_lo"),
        F.col("b_hi").alias("q_hi"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    ham = (
        codes.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                F.bit_count(F.col("q_lo").bitwiseXOR(F.col("b_lo")))
                + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("b_hi")))
            ).alias("hamming"),
            "embedding",
            "nrm",
            "q_emb",
            "q_nrm",
        )
    )
    w_ham = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    cand = (
        ham.withColumn("rk", F.row_number().over(w_ham))
        .filter(F.col("rk") <= _BQ_CAND)
        .drop("rk")
    )
    cosine = dot_col(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    res = (
        cand.select("query_id", "vec_id", "hamming", cosine.alias("cosine"))
        .withColumn("k_rank", F.row_number().over(w_cos))
        .filter(F.col("k_rank") <= IVF_TOP_K)
        .transform(snapshot())
    )
    return res


def _binary_recall_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        IVF_TOP_K,
        _cos_duck,
    )

    return f"""
        WITH bqr AS MATERIALIZED ({_binary_rerank_oracle()}),
        exact AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                    v.vec_id ASC
                       ) AS k_rank
                FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
                WHERE q.vec_id < {IVF_N_QUERIES}
            ) WHERE k_rank <= {IVF_TOP_K}
        )
        SELECT e.query_id,
               COUNT(*) AS k,
               COUNT(b.vec_id) AS n_hit,
               CAST(COUNT(b.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_k
        FROM exact e
        LEFT JOIN bqr b ON b.query_id = e.query_id AND b.vec_id = e.vec_id
        GROUP BY e.query_id
    """


@register(
    "q_sim_ann_binary_recall",
    oracle=_binary_recall_oracle(),
    doc=(
        "Recall@k of the binary-quantization searcher against exact "
        "brute-force cosine top-k — the fifth searcher gate, on the "
        "same shared session-cached ground truth as IVF / IVF+PQ / "
        "flat-graph / HNSW, so all five architectures are measured "
        "against one table."
    ),
    tags=("similarity", "ann", "quantization", "evaluation"),
)
def q_sim_ann_binary_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import exact_topk_table

    approx = q_sim_ann_binary_rerank(spark, sf_dir).select(
        "query_id", "vec_id"
    )
    exact = exact_topk_table(spark, sf_dir)
    hit = exact.join(
        approx.withColumnRenamed("vec_id", "h_vec").withColumnRenamed(
            "query_id", "h_query"
        ),
        (F.col("query_id") == F.col("h_query"))
        & (F.col("vec_id") == F.col("h_vec")),
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.count("h_vec").alias("n_hit"),
        (F.count("h_vec").cast("double") / F.count("*")).alias(
            "recall_at_k"
        ),
    )
