"""Corpus-scale operators: count-min sketch heavy hitters and the
composed end-to-end preprocessing pipeline.

The CMS here is the real sketch expressed relationally: D=4 seeded
md5 hash rows x W=256 counters, built with one groupBy — the counter
table is fixed-size regardless of corpus size, which is the entire
point at 100 TB (the exact token-count table grows with vocabulary;
the sketch does not). Estimates are provably >= true counts
(never-underestimate invariant is part of the query output).

The pipeline entry composes the engine's preprocessing stages —
normalize -> tokenize -> quality gate -> exact near-dup drop ->
corpus accounting — in ONE declarative plan, demonstrating that the
individual operators fuse without materialization barriers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

CMS_D = 4
CMS_W = 256
CMS_TOP = 20


def _h_spark(i: int) -> str:
    return (
        f"cast(conv(substring(md5(concat('cms{i}:', token)), 1, 15), 16, 10) as bigint)"
        f" % {CMS_W}"
    )


def _h_duck(i: int) -> str:
    return (
        f"CAST(('0x' || substring(md5('cms{i}:' || token), 1, 15)) AS BIGINT) % {CMS_W}"
    )


def _cms_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (token, n_true, i, bucket) CMS hash expansion —
    read three times per call (counters, candidates, estimate join)."""
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build() -> DataFrame:
        d = load(spark, sf_dir, "documents")
        counts = (
            d.select(F.explode(F.split("text", " ")).alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count("*").alias("n_true"))
        )
        hashed = counts.select(
            "token",
            "n_true",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("i"), F.expr(_h_spark(i)).alias("bucket"))
                        for i in range(CMS_D)
                    ]
                )
            ).alias("h"),
        ).select(
            "token", "n_true", F.col("h.i").alias("i"), F.col("h.bucket").alias("bucket")
        )
        return hashed.persist()

    return _cached("cms_hashed", spark, sf_dir, build)


@register(
    "q_text_heavy_hitters_cms",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        counts AS (
            SELECT token, COUNT(*) AS n_true FROM tok
            WHERE token <> '' GROUP BY token
        ),
        hashed AS (
            SELECT token, n_true, i,
                   CASE i {" ".join(f"WHEN {i} THEN {_h_duck(i)}" for i in range(CMS_D))}
                   END AS bucket
            FROM counts, (SELECT unnest([{", ".join(map(str, range(CMS_D)))}]) AS i)
        ),
        counters AS (
            SELECT i, bucket, CAST(SUM(n_true) AS BIGINT) AS c
            FROM hashed GROUP BY i, bucket
        ),
        cand AS (
            SELECT token, n_true FROM counts
            QUALIFY ROW_NUMBER() OVER (ORDER BY n_true DESC, token ASC) <= {CMS_TOP}
        )
        SELECT h.token, MIN(h.n_true) AS n_true,
               CAST(MIN(c.c) AS BIGINT) AS cms_estimate,
               (MIN(c.c) >= MIN(h.n_true)) AS never_underestimates
        FROM hashed h
        JOIN counters c ON c.i = h.i AND c.bucket = h.bucket
        WHERE h.token IN (SELECT token FROM cand)
        GROUP BY h.token
    """,
    doc=(
        f"Count-min sketch heavy hitters: D={CMS_D} seeded md5 hash "
        f"rows x W={CMS_W} counters built with one groupBy; the top-"
        f"{CMS_TOP} tokens' estimates are min-over-rows counter reads. "
        "The counter table is O(D*W) regardless of corpus size — the "
        "mergeable-sketch scale path next to the exact vocabulary "
        "count. The never_underestimates column carries the CMS "
        "one-sided-error invariant into the oracle check."
    ),
    tags=("text", "sketch", "heavy-hitters"),
)
def q_text_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashed = _cms_hashed(spark, sf_dir)
    counts = hashed.filter(F.col("i") == 0).select("token", "n_true")
    counters = hashed.groupBy("i", "bucket").agg(F.sum("n_true").alias("c"))
    # global top-k via TakeOrderedAndProject (deterministic tiebreak),
    # not a partitionless window (which would single-partition the sort)
    cand = (
        counts.orderBy(F.col("n_true").desc(), F.col("token").asc())
        .limit(CMS_TOP)
        .select("token")
    )
    return (
        hashed.join(F.broadcast(cand), "token")
        .join(counters, ["i", "bucket"])
        .groupBy("token")
        .agg(
            F.min("n_true").alias("n_true"),
            F.min("c").alias("cms_estimate"),
            (F.min("c") >= F.min("n_true")).alias("never_underestimates"),
        )
    )


@register(
    "q_corpus_pipeline",
    oracle=r"""
        WITH norm AS (
            SELECT doc_id, lang, source,
                   lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
            FROM documents
        ),
        sig AS (
            SELECT doc_id, lang, source,
                   len(string_split(t, ' ')) AS n_tok,
                   md5(t) AS fp
            FROM norm
        ),
        flagged AS (
            SELECT doc_id, lang, source, n_tok, fp,
                   (n_tok < 20) AS is_short,
                   CASE WHEN n_tok >= 20 THEN
                       ROW_NUMBER() OVER (
                           PARTITION BY (CASE WHEN n_tok >= 20 THEN fp END)
                           ORDER BY doc_id ASC)
                   END AS rn
            FROM sig
        )
        SELECT lang, source,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN is_short THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
               CAST(SUM(CASE WHEN NOT is_short AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dups,
               CAST(SUM(CASE WHEN NOT is_short AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(SUM(CASE WHEN NOT is_short AND rn = 1 THEN n_tok ELSE 0 END)
                    AS BIGINT) AS tokens_kept
        FROM flagged
        GROUP BY lang, source
    """,
    doc=(
        "The preprocessing pipeline composed end-to-end in one plan: "
        "normalize (lower/collapse-ws/trim) -> tokenize -> quality "
        "gate (>= 20 tokens) -> exact-dup drop (first doc_id per "
        "normalized-content md5) -> per-(lang, source) corpus "
        "accounting. One window pass over the fingerprint partition + "
        "one final aggregation; no stage materializes an intermediate "
        "corpus — the operators fuse declaratively, which is what "
        "keeps a 100 TB preprocessing run at scan speed."
    ),
    tags=("text", "pipeline", "dedup"),
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    sig = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split(t, " ")).alias("n_tok"),
        F.md5(t).alias("fp"),
    )
    is_short = F.col("n_tok") < 20
    w = Window.partitionBy(F.when(~is_short, F.col("fp"))).orderBy(F.col("doc_id").asc())
    flagged = sig.select(
        "lang",
        "source",
        "n_tok",
        is_short.alias("is_short"),
        F.when(~is_short, F.row_number().over(w)).alias("rn"),
    )
    kept = (~F.col("is_short")) & (F.col("rn") == 1)
    dup = (~F.col("is_short")) & (F.col("rn") > 1)
    return flagged.groupBy("lang", "source").agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("is_short").cast("long")).alias("n_short"),
        F.sum(dup.cast("long")).alias("n_dups"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).alias("tokens_kept"),
    )
