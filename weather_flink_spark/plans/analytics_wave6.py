"""Sixth wave: pipeline-infrastructure operators (SURVEY.md §2-C).

- ``q_mv_incremental_agg`` — incremental materialized-view maintenance:
  a per-customer revenue MV built from *partial aggregates* of the
  historical slice merged with the fresh-delta slice, proven equal to
  a full recompute (the oracle computes the direct full aggregation).
  This is the Delta-/Iceberg-style MV refresh shape: at 100 TB you
  never re-scan history — you aggregate the delta and merge partials
  keyed on the MV key.
- ``q_text_bpe_pairs`` — BPE merge-candidate mining: corpus-frequency-
  weighted adjacent-symbol-pair counts (the inner loop of byte-pair-
  encoding training), computed over the *distinct-word* table so the
  pair explosion is |vocab|·word_len, not |corpus|·word_len.
- ``q_sim_ann_recall`` — ANN quality evaluation: recall@k of the IVF
  (nprobe=1) searcher against exact brute-force cosine top-k, per
  query and overall — the accuracy harness that must accompany any
  approximate index before it replaces the exact path.

Parity discipline as everywhere (registry.py): exact DECIMAL money
sums, deterministic tie-breaks, identical aliases both engines. The
reference has no batch surface at all (empty plan body,
WeatherProcessingJobPlan.java:9-11); these are §2-C north-star entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.plans.llm_pipeline import dot_col, norm_col

# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance
# ---------------------------------------------------------------------------

_MV_CUTOFF = "TIMESTAMP '2000-01-01 00:00:00'"


@register(
    "q_mv_incremental_agg",
    oracle=f"""
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue,
               MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_custkey
    """,
    doc=(
        "Incremental MV maintenance: the per-customer revenue view is "
        "NOT recomputed from scratch — the historical slice (< cutoff) "
        "and the delta slice (>= cutoff) are aggregated independently "
        "and their *partials* merged with a full outer join "
        "(count-sum-max are all mergeable aggregates). The oracle is the "
        "direct full recompute, so the hash match proves "
        "merge(partial_hist, partial_delta) == recompute(full) — the "
        "refresh contract a 100 TB MV pipeline depends on (aggregate "
        "only the delta, merge keyed on the MV key, never re-scan "
        "history). Both partial aggregations keep DECIMAL sums so the "
        "merged double is bit-identical to the one-shot aggregation."
    ),
    tags=("mv", "incremental", "agg"),
)
def q_mv_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cutoff = F.expr(_MV_CUTOFF)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("p_n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("p_rev"),
            F.max("o_orderdate").alias("p_last"),
        )

    hist = partial(o.where(F.col("o_orderdate") < cutoff))
    delta = partial(o.where(F.col("o_orderdate") >= cutoff))
    merged = hist.alias("h").join(
        delta.alias("d"), on="o_custkey", how="full_outer"
    )
    return merged.select(
        "o_custkey",
        (F.coalesce(F.col("h.p_n"), F.lit(0)) + F.coalesce(F.col("d.p_n"), F.lit(0))).alias(
            "n_orders"
        ),
        (
            F.coalesce(F.col("h.p_rev"), F.lit(0).cast("decimal(18,6)"))
            + F.coalesce(F.col("d.p_rev"), F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("revenue"),
        F.greatest(F.col("h.p_last"), F.col("d.p_last")).alias("last_order"),
    )


# ---------------------------------------------------------------------------
# BPE merge-candidate mining
# ---------------------------------------------------------------------------

_BPE_TOP = 30


@register(
    "q_text_bpe_pairs",
    oracle=f"""
        WITH words AS (
            SELECT w, COUNT(*) AS freq
            FROM (
                SELECT UNNEST(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS w
                FROM documents
            )
            GROUP BY w
        ),
        pairs AS (
            SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
            FROM (
                SELECT freq,
                       UNNEST(list_transform(
                           range(1, length(w)),
                           i -> substring(w, CAST(i AS INT), 2))) AS pair
                FROM words
                WHERE length(w) >= 2
            )
            GROUP BY pair
        )
        SELECT pair, pair_count, rk FROM (
            SELECT pair, pair_count,
                   ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair ASC) AS rk
            FROM pairs
        ) WHERE rk <= {_BPE_TOP}
    """,
    doc=(
        "BPE training inner loop: corpus-frequency-weighted adjacent "
        "character-pair counts, top candidates ranked for the next merge. "
        "The pair explosion runs over the DISTINCT-word table with its "
        "corpus frequency attached — |vocab|·len work instead of "
        "|corpus|·len (the same rollup-first trick real BPE trainers "
        "use). Final rank is a TakeOrdered top-30, not a global sort."
    ),
    tags=("text", "tokenizer"),
)
def q_text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.expr("filter(split(text, ' '), t -> t <> '')")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    pairs = (
        words.where(F.length("w") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )
    w_rank = Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    # bounded input (pair alphabet is tiny) — rank then cut; WindowGroupLimit
    # pushes the top-k into the sort
    return (
        pairs.withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") <= _BPE_TOP)
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation (IVF vs exact brute force)
# ---------------------------------------------------------------------------

from weather_flink_spark.plans.llm_extra import (  # noqa: E402
    IVF_CENTROID_STRIDE,
    IVF_N_QUERIES,
    IVF_TOP_K,
    _cos_duck,
)


@register(
    "q_sim_ann_recall",
    oracle=f"""
        WITH cent AS (
            SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings
            WHERE vec_id % {IVF_CENTROID_STRIDE} = 0
        ),
        assigned AS (
            SELECT vec_id, embedding, cent_id AS cell FROM (
                SELECT e.vec_id, e.embedding, c.cent_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_cos_duck('e.embedding', 'c.cent_emb')} DESC,
                                    c.cent_id ASC
                       ) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        ivf AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                    v.vec_id ASC
                       ) AS k_rank
                FROM assigned q JOIN assigned v
                  ON q.cell = v.cell AND q.vec_id <> v.vec_id
                WHERE q.vec_id < {IVF_N_QUERIES}
            ) WHERE k_rank <= {IVF_TOP_K}
        ),
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
               COUNT(i.vec_id) AS n_hit,
               CAST(COUNT(i.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_k
        FROM exact e
        LEFT JOIN ivf i ON i.query_id = e.query_id AND i.vec_id = e.vec_id
        GROUP BY e.query_id
    """,
    doc=(
        "ANN accuracy harness: recall@k of the IVF nprobe=1 searcher "
        "against exact brute-force cosine top-k, per query. The exact "
        "side broadcasts the bounded query set against the corpus (the "
        "same shape as q_sim_cosine_topk); the approximate side reuses "
        "the IVF cell-blocked search; the comparison is a join on "
        "(query, neighbor). This is the gate that must pass before an "
        "approximate index replaces the exact path in production — "
        "deterministic (fixed centroid subset, tie-broken ranks) and "
        "therefore oracle-checkable end to end."
    ),
    tags=("similarity", "ann", "evaluation"),
)
def q_sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import q_sim_ann_ivf

    e = load(spark, sf_dir, "embeddings")
    ivf = q_sim_ann_ivf(spark, sf_dir).select("query_id", "vec_id")

    q = e.filter(F.col("vec_id") < IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cos = dot_col(F.col("q_emb"), F.col("embedding")) / (
        norm_col(F.col("q_emb")) * norm_col(F.col("embedding"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    exact = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("k_rank", F.row_number().over(w_rank))
        .filter(F.col("k_rank") <= IVF_TOP_K)
        .select("query_id", "vec_id")
    )
    hit = exact.join(
        ivf.withColumnRenamed("vec_id", "ivf_vec").withColumnRenamed(
            "query_id", "ivf_query"
        ),
        (F.col("query_id") == F.col("ivf_query")) & (F.col("vec_id") == F.col("ivf_vec")),
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.count("ivf_vec").alias("n_hit"),
        (F.count("ivf_vec").cast("double") / F.count("*")).alias("recall_at_k"),
    )
