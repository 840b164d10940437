"""LLM-training-data pipeline operators (SURVEY.md §2-C north-star block).

Dedup (exact + MinHash/LSH near-dup), text analysis (tokenize/TF,
quality scoring, fingerprinting, per-language stats), similarity search
(cosine top-k, blocked all-pairs) over ``documents`` / ``embeddings``.

Scale posture (the whole point of these ops):
- Near-dup never goes O(n²): MinHash band buckets block the self-join;
  only bucket-colliding candidates get exact Jaccard verification.
- All hashing is md5-based and seeded → deterministic and expressible
  in both Spark and the DuckDB oracle (SURVEY.md §4.3 item 5).
- Embedding math stays in sequential array folds (identical left-fold
  float semantics in both engines), vectorized JVM-side in Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# shared expression builders (tokens / shingles / minhash)
# ---------------------------------------------------------------------------


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(F.col(text), " ")


def shingles_col(tok: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a token array (word k-grams).

    Total on short inputs: fewer than k tokens → empty shingle set
    (matches DuckDB's empty ``range``), never an out-of-bounds access.
    """
    idx = F.when(
        F.size(tok) >= k, F.sequence(F.lit(1), F.size(tok) - (k - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.array_distinct(gram)


def minhash_col(shingles: Column, seed: int) -> Column:
    """Deterministic min-hash: lexicographic min of md5(seed || shingle).

    md5 exists in both Spark and DuckDB with identical hex output, so the
    oracle reproduces the signature bit-for-bit (no engine-private hash).
    """
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"s{seed}:"), s))))


SHINGLE_SQL = (
    "list_distinct(list_transform(range(1, GREATEST(len(tok) - 1, 1)),"
    " i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))"
)


def minhash_sql(seed: int) -> str:
    return f"list_min(list_transform(shingles, s -> md5('s{seed}:' || s)))"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")


@register(
    "q_text_tokenize_tf",
    oracle="""
        SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
            FROM documents
        )
        WHERE token <> ''
        GROUP BY token
    """,
    doc="Tokenize + corpus term/document frequencies (split → explode → hash agg).",
    tags=("text",),
)
def q_text_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens_col()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
    )


@register(
    "q_text_lang_stats",
    oracle="""
        SELECT
            lang,
            COUNT(*) AS n_docs,
            COUNT(DISTINCT source) AS n_sources,
            CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
            MIN(n_chars) AS min_chars,
            MAX(n_chars) AS max_chars,
            quantile_cont(n_chars, 0.5) AS median_chars
        FROM documents
        GROUP BY lang
    """,
    doc="Per-language corpus stats: counts, exact avg, min/max, continuous median.",
    tags=("text", "stats"),
)
def q_text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.expr("percentile(n_chars, 0.5)").alias("median_chars"),
    )


@register(
    "q_text_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tok
            FROM documents
        )
        SELECT
            doc_id,
            lang,
            len(tok) AS n_tokens,
            len(list_distinct(tok)) AS n_uniq_tokens,
            CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok) AS ttr,
            CAST(n_chars AS DOUBLE) / len(tok) AS chars_per_token,
            CAST(len(list_filter(tok, x -> x IN {STOPWORDS!r})) AS DOUBLE) / len(tok)
                AS stopword_ratio,
            ROUND((CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok)) * LN(1.0 + len(tok)), 6)
                AS quality_score
        FROM t
    """,
    doc=(
        "Per-document quality signals: token count, type-token ratio, "
        "chars/token, stopword ratio, composite score — the heuristic "
        "quality-filter stage of a training-data pipeline."
    ),
    tags=("text", "quality"),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = tokens_col()
    n_tok = F.size(tok)
    n_uniq = F.size(F.array_distinct(tok))
    ttr = n_uniq.cast("double") / n_tok
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(tok, lambda x: F.array_contains(stop_arr, x)))
    return d.select(
        "doc_id",
        "lang",
        n_tok.cast("bigint").alias("n_tokens"),
        n_uniq.cast("bigint").alias("n_uniq_tokens"),
        ttr.alias("ttr"),
        (F.col("n_chars").cast("double") / n_tok).alias("chars_per_token"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        F.round(ttr * F.log(F.lit(1.0) + n_tok), 6).alias("quality_score"),
    )


@register(
    "q_text_fingerprint",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tok FROM documents
        ), s AS (
            SELECT doc_id, tok, {SHINGLE_SQL} AS shingles FROM t
        )
        SELECT
            doc_id,
            md5(array_to_string(tok, ' ')) AS content_md5,
            {minhash_sql(1)} AS min_shingle_hash
        FROM s
    """,
    doc=(
        "Document fingerprinting: full-content md5 + min-shingle hash "
        "(1-perm minhash) — the cheap first-pass signature for dedup."
    ),
    tags=("text", "fingerprint"),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = tokens_col()
    sh = shingles_col(tok)
    return d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", tok)).alias("content_md5"),
        minhash_col(sh, 1).alias("min_shingle_hash"),
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@register(
    "q_dedup_exact",
    oracle="""
        SELECT
            md5(text) AS fingerprint,
            COUNT(*) AS n_copies,
            MIN(doc_id) AS canonical_id
        FROM documents
        GROUP BY md5(text)
    """,
    doc=(
        "Exact dedup: md5-content groups with a deterministic canonical "
        "representative (min doc_id). At scale: one hash-shuffle on the "
        "16-byte fingerprint, never on the document body."
    ),
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("canonical_id"))
    )


N_MINHASH = 8  # 4 bands × 2 rows
N_BANDS = 4


# Session-scoped signature-table cache: "write the signature table
# once" made literal. Four registry entries (near-minhash, clusters,
# leakage check, minhash accuracy) share the same persisted shingle and
# band tables instead of each rebuilding them; keyed by applicationId
# so a fresh SparkContext never sees another context's DataFrames.
_SIG_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cached(kind: str, spark: SparkSession, sf_dir: str, build) -> DataFrame:
    key = (kind, spark.sparkContext.applicationId, sf_dir)
    if key not in _SIG_CACHE:
        _SIG_CACHE[key] = build()
    return _SIG_CACHE[key]


def shingle_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached (doc_id, shingle_h28) signature table for ``sf_dir``."""
    from weather_flink_spark.io import load as _load

    return _cached(
        "shingles", spark, sf_dir, lambda: _shingle_table(_load(spark, sf_dir, "documents"))
    )


def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached exploded (doc_id, band_id, band_key) LSH band table."""
    return _cached(
        "bands", spark, sf_dir, lambda: _minhash_bands(shingle_table(spark, sf_dir))
    )


def shingle_hash_col(tok: Column) -> Column:
    """Distinct 28-bit 3-shingle hashes of a token array — the one
    shingle expression shared by the batch signature table and the
    streaming incremental-dedup path (pure expressions, so it runs
    unchanged on a streaming DataFrame)."""
    # total on short docs: < 3 tokens → no shingles (no OOB element_at)
    idx = F.when(F.size(tok) >= 3, F.sequence(F.lit(1), F.size(tok) - 2)).otherwise(
        F.expr("array()").cast("array<int>")
    )
    gram_hash = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at(tok, i.cast("int")),
                        F.element_at(tok, (i + 1).cast("int")),
                        F.element_at(tok, (i + 2).cast("int")),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long"),
    )
    return F.array_distinct(gram_hash)


def _shingle_table(d: DataFrame) -> DataFrame:
    """(doc_id, shingle_h28): 28-bit shingle-hash sets, materialized once.

    Design notes, all measured at sf0.1 (5000 docs, 56 s → ~4 s):
    - Shingles are never materialized as strings: each 3-gram is built,
      md5-hashed and truncated to 28 bits inside ONE lambda body, so the
      token array is read instead of re-derived (interpreted
      higher-order projections get no common-subexpression elimination —
      any expression referenced twice is computed twice).
    - Tokens come through a persist barrier for the same reason: the
      persist is the CSE/recompute barrier, and the LSH self-join below
      would otherwise recompute the whole tree on both sides. At
      cluster scale this persist is the classic "write the signature
      table once" step of a MinHash pipeline.
    - Downstream Jaccard runs on the hashed sets (deterministic and
      identical in both engines; 28-bit collisions only merge ~1e-5 of
      shingle pairs and affect both engines identically).
    - The repartition spreads hash-heavy work across cores (a single
      small parquet file is one input split locally) and keys the table
      for the downstream joins.
    """
    toks = (
        d.repartition(d.sparkSession.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", tokens_col().alias("tok"))
        .persist()
    )
    res = toks.select(
        "doc_id", shingle_hash_col(F.col("tok")).alias("shingle_h28")
    ).persist()
    res.count()  # materialize so the token intermediate can be released now
    toks.unpersist()
    return res


# Universal-hash permutations over the 28-bit base hash: proper
# independent minhash perms (unlike double-hashing, whose correlated
# mins break LSH band independence). a_i·h + b_i < 2^59 + 2^31 — exact
# BIGINT arithmetic, identical in Spark and DuckDB.
MINHASH_PERMS = [
    (1500450271, 2103518347),
    (2860486313, 1534812407),
    (1111111121, 1076767861),
    (2071723019, 1000000007),
    (433024253, 2006654197),
    (1677216671, 987654323),
    (736787717, 1414213563),
    (2147481503, 1732050807),
]
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def _perm_value(h: Column, i: int) -> Column:
    a, b = MINHASH_PERMS[i]
    return (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)


def _minhash_bands(sh: DataFrame) -> DataFrame:
    """doc_id + exploded (band_id, band_key) from an 8-perm minhash signature."""

    def perm_min(i: int) -> Column:
        return F.array_min(F.transform(F.col("shingle_h28"), lambda h: _perm_value(h, i)))

    sig = [perm_min(i) for i in range(N_MINHASH)]
    rows_per_band = N_MINHASH // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            s.cast("string")
                            for s in sig[b * rows_per_band : (b + 1) * rows_per_band]
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    return (
        sh.select("doc_id", F.explode(bands).alias("band"))
        .select("doc_id", "band.band_id", "band.band_key")
        .persist()
    )


def _perm_sql(i: int) -> str:
    a, b = MINHASH_PERMS[i]
    return f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P}))"


H28_SHINGLE_SQL = (
    "list_distinct(list_transform(range(1, GREATEST(len(tok) - 1, 1)),"
    " i -> CAST('0x' || md5(tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])[1:7] AS BIGINT)))"
)

_BANDS_SQL = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ), hashed AS (
        SELECT doc_id, {H28_SHINGLE_SQL} AS hs FROM t
    ), sig AS (
        SELECT doc_id,
            {", ".join(f"{_perm_sql(i)} AS mh{i}" for i in range(N_MINHASH))}
        FROM hashed
    ), bands AS (
        SELECT doc_id,
            UNNEST([
                {", ".join(
                    "{'band_id': %d, 'band_key': md5(CAST(mh%d AS VARCHAR) || '|' || CAST(mh%d AS VARCHAR))}"
                    % (b, 2 * b, 2 * b + 1)
                    for b in range(N_BANDS)
                )}
            ]) AS band
        FROM sig
    )
    SELECT doc_id, band.band_id AS band_id, band.band_key AS band_key FROM bands
"""


# the full near-dup pair pipeline as oracle SQL — reused by
# q_dedup_near_minhash and as the edge set of q_dedup_clusters
NEAR_DUP_PAIRS_SQL = f"""
        WITH bands AS ({_BANDS_SQL}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        sh AS (
            SELECT doc_id, {H28_SHINGLE_SQL} AS hs
            FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
        )
        SELECT
            c.doc_a,
            c.doc_b,
            CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
              / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)))
              AS jaccard
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
              / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)))
              >= 0.5
"""


@register(
    "q_dedup_near_minhash",
    oracle=NEAR_DUP_PAIRS_SQL,
    doc=(
        "MinHash+LSH near-duplicate detection: 28-bit hashed 3-shingle "
        "sets → 8 universal-hash minhash perms → 4 bands of 2 → bucket "
        "self-join for candidates → hashed-shingle Jaccard ≥ 0.5 "
        "verification. Never O(n²): pair generation is blocked by band "
        "buckets, and the signature table is persisted so the self-join "
        "doesn't recompute it."
    ),
    tags=("dedup", "lsh"),
)
def q_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return near_dup_pairs(spark, sf_dir)


def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached verified near-dup pair table (doc_a, doc_b, jaccard).

    Cached (and persisted) like the signature tables: the pair list is
    the other artifact a dedup pipeline materializes exactly once —
    q_dedup_near_minhash emits it, q_dedup_clusters consumes it as its
    edge set, so the band self-join + Jaccard verification should not
    re-execute per consumer.
    """
    return _cached("pairs", spark, sf_dir, lambda: _near_dup_pairs(spark, sf_dir))


def _near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingle_table(spark, sf_dir)
    bands = minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = sh.alias("x")
    y = sh.alias("y")
    inter = F.size(F.array_intersect(F.col("x.shingle_h28"), F.col("y.shingle_h28")))
    union = F.size(F.col("x.shingle_h28")) + F.size(F.col("y.shingle_h28")) - inter
    jac = inter.cast("double") / union
    return (
        cand.join(x, cand.doc_a == F.col("x.doc_id"))
        .join(y, cand.doc_b == F.col("y.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .persist()
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

DOT_SQL = (
    "list_sum(list_transform(range(1, 65),"
    " i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))"
)
NORM_SQL = "SQRT(list_sum(list_transform({v}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic double math, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _emb_table(d: DataFrame) -> DataFrame:
    """(vec_id, label, demb, nrm): double-cast embeddings + L2 norms.

    Persisted for the same reason as the MinHash signature table: the
    pairwise self-join would otherwise recompute cast + norm fold per
    PAIR instead of per ROW (O(n²·d) extra interpreted work). cosine
    stays dot/(na·nb) — bit-identical to the oracle's formula.
    """
    return (
        d.repartition(d.sparkSession.sparkContext.defaultParallelism, "vec_id")
        .select(
            "vec_id",
            "label",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("demb"),
            norm_col(F.col("embedding")).alias("nrm"),
        )
        .persist()
    )


def emb_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (vec_id, label, demb, nrm) embedding table."""
    from weather_flink_spark.io import load as _load

    return _cached(
        "embtable", spark, sf_dir, lambda: _emb_table(_load(spark, sf_dir, "embeddings"))
    )


@register(
    "q_sim_cosine_topk",
    oracle=f"""
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5)
        SELECT query_id, vec_id, cosine, k_rank FROM (
            SELECT
                q.vec_id AS query_id,
                e.vec_id AS vec_id,
                {DOT_SQL} / ({NORM_SQL.format(v='q')} * {NORM_SQL.format(v='e')}) AS cosine,
                ROW_NUMBER() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY {DOT_SQL} / ({NORM_SQL.format(v='q')} * {NORM_SQL.format(v='e')}) DESC,
                             e.vec_id ASC
                ) AS k_rank
            FROM q, embeddings e
            WHERE q.vec_id <> e.vec_id
        )
        WHERE k_rank <= 10
    """,
    doc=(
        "Similarity search: brute-force cosine top-10 for 5 query vectors. "
        "Query side broadcast; scan side computes dot/norm in one pass "
        "(sequential array fold — no shuffle until the per-query top-k)."
    ),
    tags=("similarity", "topk"),
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cosine = dot_col(F.col("q_emb"), F.col("embedding")) / (
        norm_col(F.col("q_emb")) * norm_col(F.col("embedding"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("k_rank", F.row_number().over(w))
        .filter(F.col("k_rank") <= 10)
    )


@register(
    "q_sim_pairwise_threshold",
    oracle=f"""
        SELECT
            q.vec_id AS vec_a,
            e.vec_id AS vec_b,
            q.label AS label,
            {DOT_SQL} / ({NORM_SQL.format(v='q')} * {NORM_SQL.format(v='e')}) AS cosine
        FROM embeddings q JOIN embeddings e
          ON q.label = e.label AND q.vec_id < e.vec_id
        WHERE {DOT_SQL} / ({NORM_SQL.format(v='q')} * {NORM_SQL.format(v='e')}) >= 0.4
    """,
    doc=(
        "All-pairs similarity above threshold, blocked on the label column "
        "(metadata blocking: pairs only form inside a block — the same "
        "shape LSH bucketing gives; never unblocked O(n²))."
    ),
    tags=("similarity", "pairwise"),
)
def q_sim_pairwise_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = emb_table(spark, sf_dir)
    a = emb.alias("a")
    b = emb.alias("b")
    cosine = dot_col(F.col("a.demb"), F.col("b.demb")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.4)
    )


# ---------------------------------------------------------------------------
# multimodal struct columns
# ---------------------------------------------------------------------------


@register(
    "q_multimodal_struct",
    oracle="""
        SELECT
            d.doc_id,
            d.lang AS meta_lang,
            d.source AS meta_source,
            d.n_chars AS meta_chars,
            LEN(e.embedding) AS emb_dim,
            LENGTH(d.text) AS text_len,
            CAST(e.embedding[1] AS DOUBLE) AS emb_first
        FROM documents d
        JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc=(
        "Multimodal record assembly: struct{text, embedding, meta{...}} "
        "built then field-pruned — Catalyst prunes unaccessed struct "
        "fields back out of the scan (nested-schema pruning)."
    ),
    tags=("multimodal",),
)
def q_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    assembled = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.struct(
                F.col("text"),
                F.col("embedding"),
                F.struct(
                    F.col("lang"), F.col("source"), F.col("n_chars")
                ).alias("meta"),
            ).alias("m"),
        )
    )
    return assembled.select(
        "doc_id",
        F.col("m.meta.lang").alias("meta_lang"),
        F.col("m.meta.source").alias("meta_source"),
        F.col("m.meta.n_chars").alias("meta_chars"),
        F.size("m.embedding").cast("bigint").alias("emb_dim"),
        F.length("m.text").cast("bigint").alias("text_len"),
        F.element_at("m.embedding", 1).cast("double").alias("emb_first"),
    )
