"""Wave-15 operators (round 4): the composed IVF+PQ ANN search.

- ``q_sim_ann_ivfpq`` — the production-shape approximate-nearest-
  neighbor query (Jégou et al. 2011 IVFADC): route each query to its
  ``IVF_NPROBE`` nearest TRAINED k-means cells (the session-cached IVF
  model shared with q_sim_ann_ivf*), scan only those cells' vectors,
  rank candidates by Asymmetric Distance Computation over their 4-byte
  PQ codes (a |queries|×16 lookup table of exact-decimal subspace
  distances — never touching the candidate's full vector), keep an
  ADC shortlist, and exactly re-rank the shortlist by true cosine.

  This composes the two separately-verified halves (trained-IVF
  routing in llm_extra/analytics_wave4; PQ codebook assignment in
  analytics_wave13) into the actual 100 TB similarity-search
  architecture: at scale the full vectors for the corpus never leave
  their cell partitions, the per-candidate work is 4 integer lookups
  into a broadcast LUT, and only |shortlist| full-precision vectors
  per query are read for the re-rank.

  Parity: ADC distances are built from 6dp-quantized DECIMAL values
  (the wave-13 PQ discipline) so shortlist selection is exact on both
  engines; the final cosine re-rank uses the established float fold
  shared with every other ANN query.

Reference parity note: the reference implements no similarity search
(its transformation plan is the empty method at
``WeatherProcessingJobPlan.java:9-11``); this operator is part of the
north-star LLM-pipeline surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave13 import (
    _PQ_KC,
    _PQ_M,
    _PQ_SUB,
    _Q6_DUCK,
    _pq_dist_spark,
    pq_codes_table,
)
from weather_flink_spark.plans.llm_extra import (
    IVF_N_QUERIES,
    IVF_TOP_K,
    _cos_duck,
    ivf_assigned_cte,
    ivf_assigned_table,
)
from weather_flink_spark.plans.llm_pipeline import dot_col
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

IVFPQ_NPROBE = 2
IVFPQ_SHORTLIST = 15  # ADC candidates exactly re-ranked per query


# ---------------------------------------------------------------------------
# Real BMP decode over multimodal payloads
# ---------------------------------------------------------------------------


@register(
    "q_multimodal_decode_bmp",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   4 + doc_id % 5 AS width,
                   2 + doc_id % 4 AS height,
                   (((4 + doc_id % 5) * 3 + 3) // 4) * 4 AS stride,
                   length(text) AS L, text
            FROM documents
        )
        SELECT doc_id, width, height, CAST(24 AS BIGINT) AS bpp, stride,
               CAST(list_sum(list_transform(
                   list_filter(range(0, height * stride),
                               i -> i % stride < width * 3),
                   i -> ascii(text[CAST(i % L AS INTEGER) + 1])
               )) AS BIGINT) AS pixel_sum
        FROM p
    """,
    doc=(
        "REAL image decode over a multimodal binary column (round-3 "
        "verdict #7): each document's payload is a genuine uncompressed "
        "24bpp BMP (operators/multimodal.bmp_encode — dimensions derive "
        "from doc_id, pixel bytes cycle the document's UTF-8 text, "
        "including 4-byte row padding), and the Arrow-batched decoder "
        "(bmp_parse) reads width/height/bpp/pixel-offset out of the "
        "little-endian header, derives the stride, and sums the actual "
        "pixel bytes with padding excluded — no stub, no external "
        "codec library. The oracle replays the byte arithmetic in SQL: "
        "dimensions from the same doc_id rule, pixel_sum from ascii() "
        "over the cycled text with padding positions filtered out. "
        "Scale: encode+decode is a narrow Arrow map, binary never "
        "shuffles; corrupt payloads tolerate-decode to nulls (the A2 "
        "drop-bad-records discipline)."
    ),
    tags=("multimodal", "binary", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_payload,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return decode_bmp(encode_bmp_payload(d))


def _pq_dist_duck_ab(m: int, a: str, b: str) -> str:
    """Exact-decimal squared L2 between subspace ``m`` of two DuckDB
    list columns (parametrized twin of analytics_wave13._pq_dist_duck)."""
    terms = []
    for i in range(1, _PQ_SUB + 1):
        d = m * _PQ_SUB + i
        x = _Q6_DUCK.format(v=a, d=d)
        c = _Q6_DUCK.format(v=b, d=d)
        terms.append(f"CAST((({x}) - ({c})) * (({x}) - ({c})) AS DECIMAL(20,12))")
    return " + ".join(terms)


def _ivfpq_oracle(
    nprobe_sql: str = str(IVFPQ_NPROBE),
    shortlist_sql: str = str(IVFPQ_SHORTLIST),
    prelude: str = "",
) -> str:
    """The IVFADC oracle, parametrized on the probe/shortlist widths so
    the r11 refined entry (digit-scaled widths read from an ``sz``
    scalar subquery passed via ``prelude``) replays the same search."""
    from weather_flink_spark.plans.analytics_wave4 import (
        KMEANS_ITERS,
        _kmeans_dist_duck,
    )

    kdist = _kmeans_dist_duck("e.embedding", "c.c")
    # PQ code assignment per subspace (the wave-13 rule, shared codebook
    # = the first _PQ_KC vectors' subvectors)
    pq_parts = []
    for m in range(_PQ_M):
        d2 = _pq_dist_duck_ab(m, "v.embedding", "c.embedding")
        # rank by the d2 alias in a nested subquery — repeating the
        # 64-term decimal expression in the window ORDER BY makes
        # DuckDB re-evaluate it per sort key (~2.3x slower, r10)
        pq_parts.append(
            f"""pq{m} AS MATERIALIZED (
                SELECT vec_id, code FROM (
                    SELECT vec_id, code,
                           ROW_NUMBER() OVER (
                               PARTITION BY vec_id
                               ORDER BY d2 ASC, code ASC) AS rn
                    FROM (
                        SELECT v.vec_id, c.vec_id AS code, {d2} AS d2
                        FROM embeddings v
                        JOIN embeddings c ON c.vec_id < {_PQ_KC}
                    )
                ) WHERE rn = 1
            )"""
        )
    code_cols = ", ".join(f"pq{m}.code AS code_{m}" for m in range(_PQ_M))
    code_joins = " ".join(
        f"JOIN pq{m} ON pq{m}.vec_id = pq0.vec_id" for m in range(1, _PQ_M)
    )
    lut_cols = ", ".join(
        f"{_pq_dist_duck_ab(m, 'q.embedding', 'c.embedding')} AS ld2_{m}"
        for m in range(_PQ_M)
    )
    adc = " + ".join(f"l{m}.ld2_{m}" for m in range(_PQ_M))
    lut_joins = " ".join(
        f"JOIN lut l{m} ON l{m}.query_id = p.query_id AND l{m}.code = k.code_{m}"
        for m in range(_PQ_M)
    )
    return f"""
        WITH {prelude}{ivf_assigned_cte()},
        probes AS MATERIALIZED (
            SELECT query_id, q_emb, probe_cell FROM (
                SELECT e.vec_id AS query_id, e.embedding AS q_emb,
                       c.cid AS probe_cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {kdist} ASC, c.cid ASC
                       ) AS rn
                FROM embeddings e CROSS JOIN cent{KMEANS_ITERS} c
                WHERE e.vec_id < {IVF_N_QUERIES}
            ) WHERE rn <= {nprobe_sql}
        ),
        {",".join(pq_parts)},
        codes AS MATERIALIZED (
            SELECT pq0.vec_id, {code_cols}
            FROM pq0 {code_joins}
        ),
        lut AS MATERIALIZED (
            SELECT q.vec_id AS query_id, c.vec_id AS code, {lut_cols}
            FROM embeddings q JOIN embeddings c ON c.vec_id < {_PQ_KC}
            WHERE q.vec_id < {IVF_N_QUERIES}
        ),
        cand AS MATERIALIZED (
            SELECT p.query_id, p.q_emb, v.vec_id, v.cell, v.embedding,
                   {adc} AS adc
            FROM probes p
            JOIN assigned v
              ON v.cell = p.probe_cell AND v.vec_id <> p.query_id
            JOIN codes k ON k.vec_id = v.vec_id
            {lut_joins}
        ),
        short AS (
            SELECT query_id, q_emb, vec_id, cell, embedding, adc FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY adc ASC, vec_id ASC
                ) AS s_rank FROM cand
            ) WHERE s_rank <= {shortlist_sql}
        )
        SELECT query_id, vec_id, cell, adc_d2, cosine, k_rank FROM (
            SELECT query_id, vec_id, cell, CAST(adc AS DOUBLE) AS adc_d2,
                   {_cos_duck('q_emb', 'embedding')} AS cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY {_cos_duck('q_emb', 'embedding')} DESC,
                                vec_id ASC
                   ) AS k_rank
            FROM short
        ) WHERE k_rank <= {IVF_TOP_K}
    """


@register(
    "q_sim_ann_ivfpq",
    oracle=_ivfpq_oracle(),
    doc=(
        "Composed IVF+PQ ANN search (IVFADC, Jegou et al. 2011): each "
        "query routes to its 2 nearest TRAINED k-means cells (shared "
        "session-cached IVF model), candidates in the probed cells are "
        "ranked by Asymmetric Distance Computation over their 4-byte "
        "PQ codes — 4 integer lookups per candidate into a broadcast "
        "|queries|x16 LUT of exact-decimal subspace distances, never "
        "the full vector — and only the ADC top-15 shortlist is "
        "re-ranked by true cosine for the final top-5. The 100 TB "
        "similarity-search architecture: full vectors stay partitioned "
        "by cell, per-candidate work is code lookups, full-precision "
        "reads are bounded at |queries|x|shortlist|. Parity: ADC is "
        "6dp-quantized DECIMAL end-to-end (exact shortlist selection "
        "on both engines); the re-rank reuses the established float "
        "cosine fold."
    ),
    tags=("similarity", "ann", "ivf", "pq", "llm-pipeline"),
)
def q_sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import _cached

    # queries x k result reused by the recall gate — session-cache
    # with truncated lineage (see q_sim_ann_graph)
    return _cached(
        "ivfpq_ann_result",
        spark,
        sf_dir,
        lambda: _ivfpq_search(spark, sf_dir).transform(snapshot()),
    )


def _ivfpq_search(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = IVF_N_QUERIES,
    nprobe: int = IVFPQ_NPROBE,
    shortlist: int = IVFPQ_SHORTLIST,
    codes: DataFrame | None = None,
    lut: DataFrame | None = None,
) -> DataFrame:
    """The IVFADC searcher; ``n_queries`` widens the query set (default
    the 5 gate queries; the wave-70 panel runs all 100 panel queries
    through this same code path). ``nprobe``/``shortlist`` widen the
    probe fan-out and the exactly-reranked ADC shortlist (defaults =
    the baseline 'ivfpq' operating point; the r11 refined tier,
    q_sim_ann_ivfpq_refined, passes the digit-scaled widths).
    ``codes``/``lut`` swap the code table (vec_id, code_0..3) and the
    ADC lookup table (query_id, code, ld2_0..3) — the r11 OPQ-refined
    tier passes the rotated-basis pair; probe routing and the exact
    cosine re-rank stay in the ORIGINAL space either way (rotation is
    an isometry of the codes, not of the stored vectors)."""
    from weather_flink_spark.plans.analytics_wave4 import (
        _kmeans_dist_col,
        kmeans_final_assignment,
    )

    assigned = ivf_assigned_table(spark, sf_dir)
    cent, _ = kmeans_final_assignment(spark, sf_dir)
    if codes is None:
        codes = pq_codes_table(spark, sf_dir)

    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )

    # --- route: nprobe nearest trained centroids by the training metric
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("cd2").asc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            "cid",
            _kmeans_dist_col("q_emb", "c").alias("cd2"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "q_nrm", F.col("cid").alias("probe_cell"))
    )

    # --- ADC lookup table: |queries| x KC rows, one exact-decimal
    # subspace distance per subspace (query subvector vs codeword)
    if lut is None:
        e = load(spark, sf_dir, "embeddings")
        codebook = e.filter(F.col("vec_id") < _PQ_KC).select(
            F.col("vec_id").alias("code"), F.col("embedding").alias("c_emb")
        )
        lut = (
            q.select("query_id", F.col("q_emb").alias("embedding"))
            .join(F.broadcast(codebook))
            .select(
                "query_id",
                "code",
                *[F.expr(_pq_dist_spark(m)).alias(f"ld2_{m}") for m in range(_PQ_M)],
            )
        )

    # --- candidates: probed cells only, ADC via 4 broadcast LUT joins
    cand = (
        assigned.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "q_emb", "q_nrm", "vec_id", "cell", "embedding", "nrm")
        .join(
            codes.select("vec_id", *[f"code_{m}" for m in range(_PQ_M)]),
            "vec_id",
        )
    )
    for m in range(_PQ_M):
        lm = lut.select(
            F.col("query_id").alias(f"qid_{m}"),
            F.col("code").alias(f"c_{m}"),
            f"ld2_{m}",
        )
        cand = cand.join(
            F.broadcast(lm),
            (F.col("query_id") == F.col(f"qid_{m}"))
            & (F.col(f"code_{m}") == F.col(f"c_{m}")),
        ).drop(f"qid_{m}", f"c_{m}")

    adc = sum((F.col(f"ld2_{m}") for m in range(1, _PQ_M)), F.col("ld2_0"))
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    short = (
        cand.withColumn("adc", adc)
        .withColumn("s_rank", F.row_number().over(w_short))
        .filter(F.col("s_rank") <= shortlist)
    )

    # --- exact re-rank of the bounded shortlist
    cos = dot_col(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        short.select(
            "query_id",
            "vec_id",
            "cell",
            F.col("adc").cast("double").alias("adc_d2"),
            cos.alias("cosine"),
        )
        .withColumn("k_rank", F.row_number().over(w_rank))
        .filter(F.col("k_rank") <= IVF_TOP_K)
    )
