"""Second-wave similarity operators: Jaro-Winkler entity matching and
multi-probe IVF search (SURVEY.md §8 round-2 candidates).

Both follow the established scale discipline: bound the pair space
first (blocking / cell routing), compute the expensive kernel only
inside the bounded blocks, rank with a deterministic tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.functions.udf_surface import jaro_winkler
from weather_flink_spark.io import load
from weather_flink_spark.plans.llm_extra import (
    IVF_CENTROID_STRIDE,
    IVF_N_QUERIES,
    IVF_TOP_K,
    _cos_duck,
)
from weather_flink_spark.plans.llm_pipeline import dot_col, norm_col
from weather_flink_spark.plans.registry import register

JW_THRESHOLD = 0.8


@register(
    "q_fuzzy_jaro_winkler",
    oracle=f"""
        WITH names AS (
            SELECT DISTINCT p_name FROM part
        ),
        p AS (
            SELECT p_name, length(p_name) AS ln, p_name[1:1] AS c1 FROM names
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        FROM p a JOIN p b
          ON a.c1 = b.c1
         AND b.ln BETWEEN a.ln - 4 AND a.ln + 4
         AND a.p_name < b.p_name
        WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= {JW_THRESHOLD}
    """,
    doc=(
        "Jaro-Winkler fuzzy matching over the DISTINCT name dictionary "
        "(blocked on first char + length ±4): the transposition-"
        "tolerant complement to q_fuzzy_match_levenshtein's edit "
        "distance. The kernel is an Arrow-batched pandas UDF "
        "(functions/udf_surface.jaro_winkler) bit-compatible with "
        "DuckDB's jaro_winkler_similarity, so the oracle diff checks "
        "the floats exactly."
    ),
    tags=("dedup", "fuzzy", "entity-resolution", "pandas-udf"),
)
def q_fuzzy_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .select(
            "p_name",
            F.length("p_name").alias("ln"),
            F.substring("p_name", 1, 1).alias("c1"),
        )
        .persist()
    )
    a, b = p.alias("a"), p.alias("b")
    jw = jaro_winkler()(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.c1") == F.col("b.c1"))
            & (F.col("b.ln").between(F.col("a.ln") - 4, F.col("a.ln") + 4))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            jw.alias("jw"),
        )
        .filter(F.col("jw") >= JW_THRESHOLD)
    )


IVF_NPROBE = 2


@register(
    "q_sim_ann_ivf_nprobe",
    oracle=f"""
        WITH cent AS (
            SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings
            WHERE vec_id % {IVF_CENTROID_STRIDE} = 0
        ),
        ranked AS (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_cos_duck('e.embedding', 'c.cent_emb')} DESC,
                                c.cent_id ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN cent c
        ),
        assigned AS (
            SELECT vec_id, embedding, cent_id AS cell FROM ranked WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, embedding AS q_emb, cent_id AS probe_cell
            FROM ranked
            WHERE rn <= {IVF_NPROBE} AND vec_id < {IVF_N_QUERIES}
        )
        SELECT query_id, vec_id, cell, cosine, k_rank FROM (
            SELECT p.query_id, v.vec_id, v.cell,
                   {_cos_duck('p.q_emb', 'v.embedding')} AS cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.query_id
                       ORDER BY {_cos_duck('p.q_emb', 'v.embedding')} DESC,
                                v.vec_id ASC
                   ) AS k_rank
            FROM probes p JOIN assigned v
              ON p.probe_cell = v.cell AND p.query_id <> v.vec_id
        ) WHERE k_rank <= {IVF_TOP_K}
    """,
    doc=(
        "Multi-probe IVF ANN (nprobe=2): vectors live in exactly one "
        "cell, but each query fans out to its 2 nearest centroids and "
        "takes the global top-5 across both probed cells — the standard "
        "recall-vs-cost knob over q_sim_ann_ivf's nprobe=1. The probe "
        "fan-out is a 2-row-per-query broadcast join; search cost is "
        "nprobe/cells of the corpus per query."
    ),
    tags=("similarity", "ann", "ivf"),
)
def q_sim_ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
    )
    cos_vc = dot_col(F.col("embedding"), F.col("cent_emb")) / (
        norm_col(F.col("embedding")) * norm_col(F.col("cent_emb"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cent_cos").desc(), F.col("cent_id").asc()
    )
    ranked = (
        e.join(F.broadcast(cent))
        .select("vec_id", "embedding", "cent_id", cos_vc.alias("cent_cos"))
        .withColumn("rn", F.row_number().over(w_assign))
        .persist()
    )
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", F.col("cent_id").alias("cell")
    )
    probes = ranked.filter(
        (F.col("rn") <= IVF_NPROBE) & (F.col("vec_id") < IVF_N_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cent_id").alias("probe_cell"),
    )
    cos_qv = dot_col(F.col("q_emb"), F.col("embedding")) / (
        norm_col(F.col("q_emb")) * norm_col(F.col("embedding"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        assigned.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "cell", cos_qv.alias("cosine"))
        .withColumn("k_rank", F.row_number().over(w_rank))
        .filter(F.col("k_rank") <= IVF_TOP_K)
    )


SEARCH_TERMS = ("scan", "merge")


@register(
    "q_text_search_boolean",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents
        )
        SELECT doc_id, lang,
               CAST(len(list_filter(tok, x -> x = '{SEARCH_TERMS[0]}')) AS BIGINT)
                   AS tf_{SEARCH_TERMS[0]},
               CAST(len(list_filter(tok, x -> x = '{SEARCH_TERMS[1]}')) AS BIGINT)
                   AS tf_{SEARCH_TERMS[1]}
        FROM t
        WHERE len(list_filter(tok, x -> x = '{SEARCH_TERMS[0]}')) > 0
          AND len(list_filter(tok, x -> x = '{SEARCH_TERMS[1]}')) > 0
    """,
    doc=(
        "Boolean AND keyword search through an inverted index: tokens "
        "explode to (term, doc_id) postings, the query terms' posting "
        "lists aggregate per doc with conditional term-frequency "
        "counts, and the AND filters to docs matching every term. At "
        "scale the postings table is the reusable index (partitioned "
        "by term, term-selective scans); the oracle states the same "
        "result as per-doc list filters."
    ),
    tags=("text", "search"),
)
def q_text_search_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term").isin(*SEARCH_TERMS))
    hits = (
        postings.groupBy("doc_id", "lang")
        .agg(
            *[
                F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{t}")
                for t in SEARCH_TERMS
            ]
        )
        .filter((F.col(f"tf_{SEARCH_TERMS[0]}") > 0) & (F.col(f"tf_{SEARCH_TERMS[1]}") > 0))
    )
    return hits
