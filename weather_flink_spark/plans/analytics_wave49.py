"""Wave-49 operators (round 8): 256-bit thermometer quantization —
the production-width binary tier (r7 verdict task #2).

The round-7 binary tier (analytics_wave43) packs one SIGN bit per
dimension — with 64-dim embeddings that is the 64-bit ceiling, and its
honest cost was recall@5 = 0.28 at sf0.1. Production binary
quantization uses 256+ bits; with only 64 physical dims the exact-math
path to 4x the bits is THERMOMETER-CODED SCALAR QUANTIZATION:

- per dimension, 4 thresholds = the corpus quintile ORDER STATISTICS
  (the value at sorted position floor(k*n/5), k=1..4, value-asc /
  vec_id-asc total order — exact and identical on both engines, no
  float interpolation);
- bit (dim, k) = embedding[dim] > thr[dim, k]; 4 bits per dim pack
  into FOUR BIGINT words (word w = dims 16w..16w+15), 32 bytes per
  vector;
- Hamming distance between thermometer codes == the L1 distance of
  the 5-level quantized vectors (unary codes turn |level_i - level_j|
  into a popcount) — a far sharper cosine proxy than 64 sign bits,
  which is exactly why the wider tier exists.

Every comparison is a raw double compare (no float summation), so the
codes are engine-exact; the threshold model is 256 BOUNDED rows
(64 dims x 4 quantiles — the sanctioned bounded-model class; at
100 TB the quantiles come from a per-dim sample or t-digest, the
scan/rerank shape is unchanged).

- ``q_emb_binary256_quantize`` — the packed code table + popcount
  sanity column (~128 of 256 bits set on quintile thresholds).
- ``q_sim_ann_binary256_rerank`` — exhaustive Hamming scan (4 xor +
  4 popcounts per comparison, 8x less data movement than the float
  scan) -> top-20 candidates -> exact float-cosine rerank to top-5,
  mirroring the 64-bit searcher stage-for-stage so the two tiers
  differ ONLY in code width.
- ``q_sim_ann_binary256_recall`` — recall@k on the shared exact
  ground truth; the test gates it >= the 64-bit tier at every SF.
- ``q_sim_ann_binary256_sampled_recall`` (round 9, r8 verdict task
  #6) — the SAMPLED-model build path: thresholds from a seeded-md5
  ~25% vector sample (the k-means sampling convention) instead of
  full-corpus order statistics, codes packed for the WHOLE corpus
  from the sampled model, same searcher, recall on the same ground
  truth. This IS the 100 TB model build (a full-corpus per-dim order
  statistic is a global sort per dimension; a bounded sample is one
  cheap scan), and the test proves recall parity with the exact-
  threshold index, so the wave-49 module-doc caveat ("at 100 TB the
  quantiles come from a per-dim sample") is now a measured fact, not
  a residual.

Parity discipline as plans/registry.py; reference parity note: the
reference implements no similarity search (empty plan body,
``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

# Hamming candidates per query fed to the exact rerank — DIGIT-SCALED
# like the graph searchers' beams (wave20.corpus_digits): a fixed pool
# is the same decay the r7 verdict called out on HNSW. 20 at the d=3
# fixture (matching the 64-bit tier's fixed pool there), 30 at sf0.1
# (d=4 on the current 2000-vector corpus).


def _b256_cand(d: int) -> int:
    return 10 * (d - 1)


_B256_CAND_SQL = "(10 * ((SELECT d FROM sz) - 1))"
_N_THR = 4  # thresholds (bits) per dimension
_DIMS = 64
_DIMS_PER_WORD = 16  # 4 bits x 16 dims = one BIGINT word


# seeded-md5 ~25% model-build sample (the k-means / HNSW-coarse-layer
# convention) for the sampled-threshold variant; codes still pack the
# WHOLE corpus — only the 256-row threshold model reads the sample
_TS_MOD = 4
_TS_PRED_SPARK = (
    "cast(conv(substring(md5(concat('thermo:', cast(vec_id as string))),"
    f" 1, 7), 16, 10) as bigint) % {_TS_MOD} = 0"
)
_TS_PRED_DUCK = (
    "CAST(('0x' || substring(md5('thermo:' || CAST(vec_id AS VARCHAR)),"
    f" 1, 7))::UBIGINT AS BIGINT) % {_TS_MOD} = 0"
)


def _thr_cte(sample_pred: str = "TRUE") -> str:
    """DuckDB CTE chain ending in ``thr`` (dim, k, thr): per-dim
    quintile order statistics, exact total order (value asc, vec_id
    asc). ``sample_pred`` restricts the MODEL-BUILD rows (rank base
    and count) — ``vals`` stays full-corpus because the code packer
    reads it for every vector."""
    return f"""
        vals AS MATERIALIZED (
            SELECT vec_id,
                   UNNEST(range(1, {_DIMS + 1})) - 1 AS dim,
                   UNNEST(embedding) AS v
            FROM embeddings
        ),
        nn AS (SELECT COUNT(*) AS n FROM embeddings WHERE {sample_pred}),
        ranked AS (
            SELECT dim, CAST(v AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (
                       PARTITION BY dim
                       ORDER BY CAST(v AS DOUBLE) ASC, vec_id ASC) AS rn
            FROM vals WHERE {sample_pred}
        ),
        thr AS MATERIALIZED (
            SELECT r.dim, q.k, r.v AS thr
            FROM ranked r
            JOIN (VALUES (1), (2), (3), (4)) q(k)
              ON r.rn = (q.k * (SELECT n FROM nn)) // 5
        )"""


def _codes_cte(sample_pred: str = "TRUE") -> str:
    """DuckDB CTE ``bq4`` (vec_id, w0..w3): the packed thermometer
    codes — bit 4*(dim%16)+(k-1) of word dim//16 set iff v > thr."""
    # bit 63 as a BIGINT power: DuckDB's << raises on 1 << 63 where
    # Spark's shiftleft wraps to the sign bit (-2^63) — special-case it
    sh = f"(4 * (t.dim % {_DIMS_PER_WORD}) + t.k - 1)"
    bit = (
        f"CASE WHEN {sh} = 63 THEN (-9223372036854775807 - 1)"
        f" ELSE CAST(1 AS BIGINT) << {sh} END"
    )
    words = ",\n                   ".join(
        f"CAST(SUM(CASE WHEN (t.dim // {_DIMS_PER_WORD}) = {w}"
        f" AND e.v > t.thr"
        f" THEN {bit}"
        f" ELSE 0 END) AS BIGINT) AS w{w}"
        for w in range(4)
    )
    return f"""
        {_thr_cte(sample_pred)},
        dvals AS (
            SELECT vec_id, dim, CAST(v AS DOUBLE) AS v FROM vals
        ),
        bq4 AS MATERIALIZED (
            SELECT e.vec_id,
                   {words}
            FROM dvals e JOIN thr t ON t.dim = e.dim
            GROUP BY e.vec_id
        )"""


def _build_thresholds(
    spark: SparkSession, sf_dir: str, sample_pred: str | None = None
) -> DataFrame:
    """The 256-row quintile model over the corpus (``sample_pred``
    None) or over the seeded-md5 model-build sample."""
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table

    emb = ivf_assigned_table(spark, sf_dir).select("vec_id", "embedding")
    if sample_pred is not None:
        emb = emb.filter(F.expr(sample_pred))
    n = emb.count()
    pos_to_k = {(k * n) // 5: k for k in range(1, _N_THR + 1)}
    vals = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", "dim", F.col("v").cast("double").alias("v"))
    w = Window.partitionBy("dim").orderBy(
        F.col("v").asc(), F.col("vec_id").asc()
    )
    k_expr = F.lit(None).cast("int")
    for p, k in pos_to_k.items():
        k_expr = F.when(F.col("rn") == p, F.lit(k)).otherwise(k_expr)
    res = (
        vals.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").isin(list(pos_to_k)))
        .select("dim", k_expr.alias("k"), F.col("v").alias("thr"))
        .persist()
    )
    res.count()
    return res


def thermo_thresholds_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached 256-row threshold model (dim, k, thr): per-dim
    quintile order statistics, computed distributed (64-partition
    window) and kept bounded — at 100 TB this is the model-build step
    (use thermo_thresholds_sampled_table there), never a data-sized
    artifact."""
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "thermo_thr", spark, sf_dir, lambda: _build_thresholds(spark, sf_dir)
    )


def thermo_thresholds_sampled_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-cached SAMPLED threshold model (r8 verdict task #6):
    the same 256-row quintile model computed over the seeded-md5
    ~25% vector sample — the 100 TB build path (a bounded sample scan
    instead of a per-dim full-corpus order statistic). Recall parity
    with the exact model is gated by
    q_sim_ann_binary256_sampled_recall's test."""
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "thermo_thr_s",
        spark,
        sf_dir,
        lambda: _build_thresholds(spark, sf_dir, _TS_PRED_SPARK),
    )


def _build_codes(spark: SparkSession, sf_dir: str, thr: DataFrame) -> DataFrame:
    """Pack the WHOLE corpus against a given 256-row threshold model."""
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table

    emb = ivf_assigned_table(spark, sf_dir)
    vals = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", "dim", F.col("v").cast("double").alias("v"))
    word_aggs = [
        F.expr(
            f"CAST(sum(CASE WHEN dim div {_DIMS_PER_WORD} = {w}"
            f" AND v > thr"
            f" THEN shiftleft(1L, 4 * (dim % {_DIMS_PER_WORD}) + k - 1)"
            f" ELSE 0L END) AS BIGINT)"
        ).alias(f"w{w}")
        for w in range(4)
    ]
    codes = (
        vals.join(F.broadcast(thr), "dim").groupBy("vec_id").agg(*word_aggs)
    )
    res = (
        emb.select("vec_id", "embedding", "nrm").join(codes, "vec_id").persist()
    )
    res.count()
    return res


def thermo_codes_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached packed thermometer codes (vec_id, w0..w3,
    embedding, nrm) — 32 code bytes per vector beside the float vector
    for the exact rerank stage."""
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "thermo_codes",
        spark,
        sf_dir,
        lambda: _build_codes(spark, sf_dir, thermo_thresholds_table(spark, sf_dir)),
    )


def thermo_codes_sampled_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached packed codes for the WHOLE corpus from the
    SAMPLED threshold model — the index the 100 TB build would ship."""
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "thermo_codes_s",
        spark,
        sf_dir,
        lambda: _build_codes(
            spark, sf_dir, thermo_thresholds_sampled_table(spark, sf_dir)
        ),
    )


@register(
    "q_emb_binary256_quantize",
    oracle=f"""
        WITH {_codes_cte()}
        SELECT vec_id, w0, w1, w2, w3,
               -- bit_count returns TINYINT in DuckDB; 4 words sum to
               -- ~128 and overflow it — widen before adding
               CAST(bit_count(w0) AS INTEGER) + CAST(bit_count(w1) AS INTEGER)
               + CAST(bit_count(w2) AS INTEGER) + CAST(bit_count(w3) AS INTEGER)
                   AS n_bits_set
        FROM bq4
    """,
    doc=(
        "256-bit thermometer quantization: per dim, 4 exact quintile "
        "order-statistic thresholds (bounded 256-row model); bit "
        "(dim,k) = v > thr packs into FOUR BIGINT words — 32 bytes "
        "per vector, and Hamming between codes == L1 distance of the "
        "5-level quantized vectors (unary coding), the sharper proxy "
        "that lifts the binary tier from its 64-bit sign-code floor "
        "(r7: recall 0.28 at sf0.1). Raw double compares only — "
        "engine-exact with zero float summation. n_bits_set ~ 128 "
        "sanity column. Scale: 3 G vectors/TB codes; consumer is "
        "q_sim_ann_binary256_rerank."
    ),
    tags=("embeddings", "quantization", "similarity"),
)
def q_emb_binary256_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = thermo_codes_table(spark, sf_dir)
    return codes.select(
        "vec_id",
        "w0",
        "w1",
        "w2",
        "w3",
        (
            F.bit_count("w0")
            + F.bit_count("w1")
            + F.bit_count("w2")
            + F.bit_count("w3")
        ).alias("n_bits_set"),
    )


def _b256_rerank_oracle(sample_pred: str = "TRUE") -> str:
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        IVF_TOP_K,
        _cos_duck,
    )

    # widen each popcount: DuckDB bit_count returns TINYINT and a
    # 256-bit distance can reach 256
    ham = " + ".join(
        f"CAST(bit_count(xor(q.w{w}, v.w{w})) AS INTEGER)" for w in range(4)
    )
    from weather_flink_spark.plans.analytics_wave20 import SZ_CTE

    return f"""
        WITH {_codes_cte(sample_pred)},
        {SZ_CTE},
        ham AS (
            SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                   {ham} AS hamming
            FROM bq4 q JOIN bq4 v ON v.vec_id <> q.vec_id
            WHERE q.vec_id < {IVF_N_QUERIES}
        ),
        cand AS (
            SELECT query_id, vec_id, hamming FROM (
                SELECT query_id, vec_id, hamming,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY hamming ASC, vec_id ASC) AS rk
                FROM ham
            ) WHERE rk <= {_B256_CAND_SQL}
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
    "q_sim_ann_binary256_rerank",
    oracle=_b256_rerank_oracle(),
    doc=(
        "256-bit thermometer ANN: exhaustive Hamming scan over the "
        "32-byte packed codes (4 xor + 4 popcounts per comparison — "
        "still 8x less data movement than the float scan) keeps "
        "top-20 candidates per query; exact float-cosine rerank to "
        "top-5. Stage-for-stage the 64-bit searcher "
        "(q_sim_ann_binary_rerank) with only the code width changed, "
        "so the recall delta isolates what 4x bits buys. Scale: "
        "broadcast bounded query side; composes with IVF cell "
        "blocking like the PQ ADC path at 100 TB."
    ),
    tags=("similarity", "ann", "quantization", "llm-pipeline"),
)
def q_sim_ann_binary256_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "b256_result", spark, sf_dir, lambda: _b256_search(spark, sf_dir)
    )


def _b256_search(
    spark: SparkSession, sf_dir: str, codes: DataFrame | None = None
) -> DataFrame:
    """The Hamming-scan + exact-rerank searcher; ``codes`` overrides
    the code table so the sampled-model recall gate runs the SAME
    searcher against the sampled index."""
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES, IVF_TOP_K
    from weather_flink_spark.plans.llm_pipeline import dot_col

    from weather_flink_spark.plans.analytics_wave20 import corpus_digits

    cand_n = _b256_cand(corpus_digits(spark, sf_dir))
    if codes is None:
        codes = thermo_codes_table(spark, sf_dir)
    q = codes.filter(F.col("vec_id") < IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"w{w}").alias(f"q{w}") for w in range(4)],
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    hamming = sum(
        F.bit_count(F.col(f"q{w}").bitwiseXOR(F.col(f"w{w}")))
        for w in range(4)
    )
    ham = codes.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        hamming.alias("hamming"),
        "embedding",
        "nrm",
        "q_emb",
        "q_nrm",
    )
    w_ham = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    cand = (
        ham.withColumn("rk", F.row_number().over(w_ham))
        .filter(F.col("rk") <= cand_n)
        .drop("rk")
    )
    cosine = dot_col(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.select("query_id", "vec_id", "hamming", cosine.alias("cosine"))
        .withColumn("k_rank", F.row_number().over(w_cos))
        .filter(F.col("k_rank") <= IVF_TOP_K)
        .transform(snapshot())
    )


def _b256_recall_oracle(sample_pred: str = "TRUE") -> str:
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        IVF_TOP_K,
        _cos_duck,
    )

    return f"""
        WITH b4r AS MATERIALIZED ({_b256_rerank_oracle(sample_pred)}),
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
        LEFT JOIN b4r b ON b.query_id = e.query_id AND b.vec_id = e.vec_id
        GROUP BY e.query_id
    """


@register(
    "q_sim_ann_binary256_recall",
    oracle=_b256_recall_oracle(),
    doc=(
        "Recall@k of the 256-bit thermometer searcher against exact "
        "brute-force cosine top-k — same shared session-cached ground "
        "truth as the other five gates; the test asserts it >= the "
        "64-bit sign-code tier at every SF (what 4x code width buys)."
    ),
    tags=("similarity", "ann", "quantization", "evaluation"),
)
def q_sim_ann_binary256_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import exact_topk_table

    approx = q_sim_ann_binary256_rerank(spark, sf_dir).select(
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


@register(
    "q_sim_ann_binary256_sampled_recall",
    oracle=_b256_recall_oracle(_TS_PRED_DUCK),
    doc=(
        "Recall@k of the 256-bit thermometer searcher built from the "
        "SAMPLED threshold model (r8 verdict task #6): thresholds are "
        "quintile order statistics over a seeded-md5 ~25% vector "
        "sample — the 100 TB model-build path (one bounded sample "
        "scan instead of a per-dim full-corpus order statistic) — "
        "codes packed for the whole corpus, SAME searcher "
        "(_b256_search codes override), same shared exact ground "
        "truth. The test gates parity with the exact-threshold tier "
        "(mean recall within one hit of q_sim_ann_binary256_recall "
        "at the fixture), turning the module-doc sampling caveat "
        "into a measured fact."
    ),
    tags=("similarity", "ann", "quantization", "evaluation", "sampling"),
)
def q_sim_ann_binary256_sampled_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import exact_topk_table
    from weather_flink_spark.plans.llm_pipeline import _cached

    approx = _cached(
        "b256s_result",
        spark,
        sf_dir,
        lambda: _b256_search(
            spark, sf_dir, codes=thermo_codes_sampled_table(spark, sf_dir)
        ),
    ).select("query_id", "vec_id")
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
