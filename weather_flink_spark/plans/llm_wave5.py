"""Fifth wave: training-data curation operators (SURVEY.md §2 LLM set).

Rounds 1 shipped the dedup/similarity/quality core; this wave adds the
curation steps a production pretraining pipeline runs around them:

- ``q_text_decontaminate``   — benchmark decontamination: 4-gram hash
                               overlap between the corpus and a held-out
                               benchmark split (the GPT-3/Llama-style
                               n-gram collision check).
- ``q_text_gopher_rules``    — the Gopher rule-based quality gate as a
                               per-document flag table (word count,
                               mean word length, stopword floor,
                               symbol ratio) + the composite verdict.
- ``q_sample_reservoir``     — deterministic per-stratum k-reservoir:
                               k smallest seeded hashes per language ≡
                               uniform sample without replacement,
                               reproducible across engines/cluster
                               sizes (never rand()).
- ``q_doc_source_stats``     — per-source corpus mix audit: volume,
                               length moments, language diversity,
                               exact-dup rate (the "domain mix" table
                               a data curator reads before weighting).
- ``q_emb_pca_project``      — distributed PCA (operators/pca.py
                               exact-integer Gramian + power-iteration
                               path) projecting embeddings onto top-4
                               sign-canonical components; oracle-exact
                               (recursive-CTE replay of the quantized
                               iteration) with a numpy-eigh |cos|≈1
                               convergence unit test.

Parity discipline as everywhere: seeded md5-derived hashing (never
rand()), exact integer/decimal accumulation, identical aliases both
sides. The reference engine has none of this surface (empty plan body,
WeatherProcessingJobPlan.java:9-11) — these are §2 north-star entries
graded against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Benchmark decontamination (4-gram hash overlap)
# ---------------------------------------------------------------------------

# 60-bit md5-derived n-gram key: fits signed BIGINT on both engines.
_NG_HASH_SPARK = "cast(conv(substring(md5(ng), 1, 15), 16, 10) as bigint)"
_NG_HASH_DUCK = "CAST('0x' || md5(ng)[1:15] AS BIGINT)"
_BENCH_BUCKET_SPARK = (
    "cast(conv(substring(md5(concat('contam:', cast(doc_id as string))), 1, 7),"
    " 16, 10) as bigint) % 100"
)
_BENCH_BUCKET_DUCK = (
    "CAST('0x' || md5('contam:' || CAST(doc_id AS VARCHAR))[1:7] AS BIGINT) % 100"
)


@register(
    "q_text_decontaminate",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   {_BENCH_BUCKET_DUCK} AS bucket,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        grams AS (
            SELECT doc_id, bucket, {_NG_HASH_DUCK} AS ngh
            FROM (
                SELECT doc_id, bucket,
                       UNNEST(list_transform(
                           range(1, len(tok) - 2),
                           i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' '
                             || tok[i+3])) AS ng
                FROM tok
                WHERE len(tok) >= 4
            )
        ),
        bench AS (SELECT DISTINCT ngh FROM grams WHERE bucket < 5),
        corpus AS (SELECT DISTINCT doc_id, ngh FROM grams WHERE bucket >= 5)
        SELECT c.doc_id,
               COUNT(*) AS n_ngrams,
               COUNT(*) FILTER (WHERE b.ngh IS NOT NULL) AS n_contaminated,
               CAST(COUNT(*) FILTER (WHERE b.ngh IS NOT NULL) AS DOUBLE)
                   / COUNT(*) AS contamination_frac
        FROM corpus c LEFT JOIN bench b ON b.ngh = c.ngh
        GROUP BY c.doc_id
        HAVING COUNT(*) FILTER (WHERE b.ngh IS NOT NULL) > 0
    """,
    doc=(
        "Benchmark decontamination, the GPT-3/Llama n-gram collision "
        "check: a seeded 5% hash split of documents plays the benchmark; "
        "every corpus document is scored by how many of its distinct "
        "4-gram 60-bit hashes appear in the benchmark set. The benchmark "
        "gram set is orders of magnitude smaller than the corpus, so the "
        "probe is a broadcast-able semi-join on the gram hash — at 100 TB "
        "the corpus grams stream map-side against it, and per-doc rollup "
        "is one partial-aggregated groupBy(doc_id)."
    ),
    tags=("text", "dedup", "decontamination"),
)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.expr(_BENCH_BUCKET_SPARK).alias("bucket"),
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("tok"),
    )
    grams = (
        tok.where(F.expr("size(tok) >= 4"))
        .select(
            "doc_id",
            "bucket",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tok) - 4), i -> "
                    "concat(tok[i], ' ', tok[i+1], ' ', tok[i+2], ' ', tok[i+3]))"
                )
            ).alias("ng"),
        )
        .select("doc_id", "bucket", F.expr(_NG_HASH_SPARK).alias("ngh"))
    )
    bench = grams.where("bucket < 5").select("ngh").distinct()
    corpus = grams.where("bucket >= 5").select("doc_id", "ngh").distinct()
    hit = corpus.join(F.broadcast(bench.withColumn("is_hit", F.lit(1))), "ngh", "left")
    return (
        hit.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("is_hit").alias("n_contaminated"),
            (F.count("is_hit").cast("double") / F.count("*")).alias("contamination_frac"),
        )
        .where("n_contaminated > 0")
    )


# ---------------------------------------------------------------------------
# Gopher rule-based quality gate
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to")
_SW_SQL = "('" + "', '".join(_STOPWORDS) + "')"


@register(
    "q_text_gopher_rules",
    oracle=f"""
        WITH feat AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), t -> t <> ''))
                       AS n_words,
                   length(replace(text, ' ', '')) AS n_letters,
                   len(list_filter(string_split(text, ' '),
                                   t -> t IN {_SW_SQL})) AS stopword_count,
                   length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g'))
                       AS n_symbols,
                   length(text) AS n_chars
            FROM documents
        )
        SELECT doc_id, n_words,
               CAST(n_letters AS DOUBLE) / n_words AS mean_word_len,
               stopword_count,
               CAST(n_symbols AS DOUBLE) / n_chars AS symbol_frac,
               (n_words BETWEEN 50 AND 100000) AS pass_word_count,
               (CAST(n_letters AS DOUBLE) / n_words BETWEEN 2.5 AND 6.5)
                   AS pass_mean_word_len,
               (stopword_count >= 2) AS pass_stopwords,
               (CAST(n_symbols AS DOUBLE) / n_chars <= 0.1) AS pass_symbols,
               ((n_words BETWEEN 50 AND 100000)
                AND (CAST(n_letters AS DOUBLE) / n_words BETWEEN 2.5 AND 6.5)
                AND (stopword_count >= 2)
                AND (CAST(n_symbols AS DOUBLE) / n_chars <= 0.1)) AS gopher_pass
        FROM feat
    """,
    doc=(
        "The Gopher rule-based quality gate as an auditable flag table: "
        "word-count bounds, mean word length band, stopword floor, and "
        "symbol-character ceiling, plus the composite verdict. All "
        "signals are total map-side expressions over the text column — "
        "zero shuffles, embarrassingly parallel at any scale; the flag "
        "columns let a curator measure each rule's kill rate before "
        "committing to the filter."
    ),
    tags=("text", "quality"),
)
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS)
    feat = d.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), t -> t <> ''))").alias("n_words"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_letters"),
        F.expr(f"size(filter(split(text, ' '), t -> t IN ({sw})))").alias(
            "stopword_count"
        ),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[^a-z ]", ""))
        ).alias("n_symbols"),
        F.length("text").alias("n_chars"),
    )
    mean_wl = F.col("n_letters").cast("double") / F.col("n_words")
    sym_frac = F.col("n_symbols").cast("double") / F.col("n_chars")
    p_wc = F.col("n_words").between(50, 100000)
    p_wl = mean_wl.between(2.5, 6.5)
    p_sw = F.col("stopword_count") >= 2
    p_sym = sym_frac <= 0.1
    return feat.select(
        "doc_id",
        "n_words",
        mean_wl.alias("mean_word_len"),
        "stopword_count",
        sym_frac.alias("symbol_frac"),
        p_wc.alias("pass_word_count"),
        p_wl.alias("pass_mean_word_len"),
        p_sw.alias("pass_stopwords"),
        p_sym.alias("pass_symbols"),
        (p_wc & p_wl & p_sw & p_sym).alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-stratum reservoir sample
# ---------------------------------------------------------------------------

_RES_HASH_SPARK = (
    "cast(conv(substring(md5(concat('reservoir:', cast(doc_id as string))), 1, 15),"
    " 16, 10) as bigint)"
)
_RES_HASH_DUCK = "CAST('0x' || md5('reservoir:' || CAST(doc_id AS VARCHAR))[1:15] AS BIGINT)"
_RES_K = 10


@register(
    "q_sample_reservoir",
    oracle=f"""
        SELECT lang, doc_id, rk
        FROM (
            SELECT lang, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY {_RES_HASH_DUCK}, doc_id) AS rk
            FROM documents
        )
        WHERE rk <= {_RES_K}
    """,
    doc=(
        "Per-stratum k-reservoir sample: the k smallest seeded md5 "
        "hashes per language — provably a uniform sample without "
        "replacement, yet fully deterministic (reruns, engines and "
        "cluster sizes agree; rand() would not). One hash-partitioned "
        "window per stratum; at 100 TB each language partition top-k "
        "truncates map-side before the shuffle (rank pushes the limit "
        "into the sort)."
    ),
    tags=("sampling", "corpus"),
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.expr(_RES_HASH_SPARK), F.col("doc_id"))
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _RES_K)
    )


# ---------------------------------------------------------------------------
# Per-source corpus mix audit
# ---------------------------------------------------------------------------


@register(
    "q_doc_source_stats",
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups,
               CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
                   / COUNT(*) AS dup_frac
        FROM documents
        GROUP BY source
    """,
    doc=(
        "The corpus-mix audit a curator reads before setting source "
        "weights: per-source volume, length moments (exact integer "
        "sums), language diversity, and exact-duplicate rate via "
        "distinct content digests. One partial-aggregated groupBy; the "
        "distinct-digest count shuffles digests, not documents."
    ),
    tags=("corpus", "agg"),
)
def q_doc_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_chars"),
        F.countDistinct("lang").alias("n_langs"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
        (
            (F.count("*") - F.countDistinct(F.md5("text"))).cast("double")
            / F.count("*")
        ).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# Distributed PCA projection (rows-only; numpy twin unit-tested)
# ---------------------------------------------------------------------------


def _pca_oracle() -> str:
    from weather_flink_spark.operators.pca import pca_power_oracle_sql

    return pca_power_oracle_sql(dim=64, k=4)


def pca_power_model(spark: SparkSession, sf_dir: str) -> dict:
    """Session-cached power-iteration PCA model over the embeddings
    table (like the k-means model: fit once, reused by every consumer)."""
    from weather_flink_spark.operators import pca
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build():
        e = pca.quantize_embeddings(load(spark, sf_dir, "embeddings"), "embedding", dim=64)
        return pca.fit_pca_power(e, "embedding", dim=64, k=4)

    return _cached("pca_power_model", spark, sf_dir, build)


@register(
    "q_emb_pca_project",
    oracle=_pca_oracle(),
    doc=(
        "Distributed PCA, oracle-exact (operators/pca.py power path): "
        "one mapInPandas pass turns 6dp-quantized embeddings into an "
        "EXACT integer Gramian (per-partition int64 matmuls accumulated "
        "in arbitrary-precision ints — bit-reproducible under any "
        "partitioning; driver sees d²+d+1 numbers, never n rows), then "
        "600-step power iteration with deflation over the 9dp-grid "
        "covariance runs driver-side in IEEE doubles whose op order the "
        "DuckDB oracle replays bit-exactly with recursive CTEs; "
        "sign-canonical top-4 components project back as a pure JVM "
        "sequential fold — the n-scaled scoring pass is whole-stage "
        "codegen with no Python. Components match numpy eigh to "
        "|cos| ≈ 1 (tests/test_pca.py)."
    ),
    tags=("embedding", "pca"),
)
def q_emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators import pca

    model = pca_power_model(spark, sf_dir)
    e = pca.quantize_embeddings(load(spark, sf_dir, "embeddings"), "embedding", dim=64)
    out = pca.project_power(e, "embedding", model, dim=64)
    return out.select("vec_id", "label", "pc1", "pc2", "pc3", "pc4")
