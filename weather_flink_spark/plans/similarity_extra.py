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
    IVF_N_QUERIES,
    IVF_TOP_K,
    _cos_duck,
    ivf_assigned_cte,
    ivf_assigned_table,
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
    from weather_flink_spark.plans.llm_extra import name_dict_table

    # session-cached dictionary shared with q_fuzzy_match_levenshtein
    p = name_dict_table(spark, sf_dir)
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


# r9 constant == ivf_nprobe(3); kept for the fixture-pinned notes and
# as the UNSCALED operating point of the baseline 'ivfpq' tier (whose
# fixed shortlist 15 measurably does NOT benefit from wider probes —
# see q_sim_ann_ivfpq_refined for why).
IVF_NPROBE = 2


def ivf_nprobe(d: int) -> int:
    """Digit-scaled IVF probe count: d-1 — 2 at the d=3 fixture (the
    r7-r10 constant, every committed hash at sf0.001/0.01 unchanged),
    3 at sf0.1 (d=4). Rationale (r10 verdict task #5): the 100-query
    panel measured nprobe=2 as the IVF tier's cell-miss ceiling at
    sf0.1 (recall 0.474; the top-2 cells hold ~55% of true neighbors
    there, shrinking as the corpus outgrows the fixed k=8 cells) while
    the graph index's equivalent knobs were already digit-scaled. Same
    convention as wave-20 g_probe: affine in (d-1), exact on both
    engines via the sz scalar subquery."""
    return d - 1


IVF_NPROBE_SQL = "((SELECT d FROM sz) - 1)"


def _nprobe_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave4 import (
        KMEANS_ITERS,
        _kmeans_dist_duck,
    )
    from weather_flink_spark.plans.analytics_wave20 import SZ_CTE

    dist = _kmeans_dist_duck("e.embedding", "c.c")
    return f"""
        WITH {SZ_CTE},
        {ivf_assigned_cte()},
        probes AS (
            SELECT query_id, q_emb, probe_cell FROM (
                SELECT e.vec_id AS query_id, e.embedding AS q_emb,
                       c.cid AS probe_cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {dist} ASC, c.cid ASC
                       ) AS rn
                FROM embeddings e CROSS JOIN cent{KMEANS_ITERS} c
                WHERE e.vec_id < {IVF_N_QUERIES}
            ) WHERE rn <= {IVF_NPROBE_SQL}
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
    """


@register(
    "q_sim_ann_ivf_nprobe",
    oracle=_nprobe_oracle(),
    doc=(
        "Multi-probe IVF ANN over the TRAINED k-means index with a "
        "DIGIT-SCALED probe count (r10 verdict task #5): vectors live "
        "in exactly one learned cell (shared session-cached assignment "
        "— fixed k, bounded broadcast), each query fans out to its "
        "nprobe = d-1 nearest centroids by the training metric (L2) — "
        "2 at the d=3 fixture (the r7-r10 constant, committed hashes "
        "unchanged), 3 at sf0.1 (d=4), where the panel measured "
        "nprobe=2 as the cell-miss ceiling (0.474; scaled: 0.608) — "
        "and takes the global top-5 by cosine across the probed cells, "
        "the standard recall-vs-cost knob over q_sim_ann_ivf's "
        "nprobe=1. The oracle computes the same count from the sz "
        "scalar subquery. Probe selection costs |queries|·k against "
        "the 8-row broadcast model; search cost is nprobe/cells of the "
        "corpus per query."
    ),
    tags=("similarity", "ann", "ivf"),
)
def q_sim_ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import (
        _kmeans_dist_col,
        kmeans_final_assignment,
    )
    from weather_flink_spark.plans.analytics_wave20 import corpus_digits

    assigned = ivf_assigned_table(spark, sf_dir)
    cent, _ = kmeans_final_assignment(spark, sf_dir)
    q = assigned.filter(F.col("vec_id") < IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("cd2").asc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "q_emb", "q_nrm", "cid", _kmeans_dist_col("q_emb", "c").alias("cd2")
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= ivf_nprobe(corpus_digits(spark, sf_dir)))
        .select("query_id", "q_emb", "q_nrm", F.col("cid").alias("probe_cell"))
    )
    cos_qv = dot_col(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
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


def _assign_gemm_oracle() -> str:
    return f"""
        WITH {ivf_assigned_cte()}
        SELECT vec_id, cell FROM assigned
    """


@register(
    "q_sim_ivf_assign_gemm",
    oracle=_assign_gemm_oracle(),
    doc=(
        "Arrow/BLAS twin of the IVF centroid assignment "
        "(operators/vector_search.assign_cells_gemm): the trained "
        "k-means model (k rows, the one sanctioned bounded collect) "
        "rides into each task via closure capture and every Arrow batch "
        "assigns its vectors with ONE GEMM — the kernel that takes over "
        "when embedding volume makes the interpreted expression fold "
        "the bottleneck. argmin(||x−c||²) drops the ||x||² term, ties "
        "break to the smallest cid exactly like the expression path; "
        "the oracle replays k-means training + assignment in SQL, so "
        "the hash match proves the BLAS kernel is assignment-identical "
        "to the Catalyst fold (also asserted per-vector in "
        "tests/test_vector_search.py)."
    ),
    tags=("similarity", "ann", "ivf", "arrow"),
)
def q_sim_ivf_assign_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.vector_search import assign_cells_gemm
    from weather_flink_spark.plans.analytics_wave4 import kmeans_final_assignment

    cent, _ = kmeans_final_assignment(spark, sf_dir)
    model = [(r["cid"], r["c"]) for r in cent.collect()]  # k rows — bounded
    return assign_cells_gemm(load(spark, sf_dir, "embeddings"), model)
