"""Wave-32 operator (round 6, continued): Kneser-Ney smoothed bigram
LM scoring.

- ``q_text_kneser_ney`` — per-document average negative log-likelihood
  under an interpolated Kneser-Ney bigram model (Kneser & Ney 1995;
  Chen & Goodman 1999 — THE n-gram smoothing production LMs used
  before neural LMs, and still the standard quality-filter scorer):
  absolute discount d = 0.75 (dyadic, exact binary double) off every
  seen bigram, mass redistributed through the CONTINUATION
  distribution (how many distinct left-contexts a word follows —
  novel-continuation probability, not raw frequency). Complements
  q_text_perplexity_bigram (MLE conditional ratios): KN separates
  burstiness from versatility, which is exactly why filter pipelines
  prefer it.

Every model quantity is an integer count (bigram count, prefix total,
distinct followers, distinct predecessors, bigram-type total); the
probability is assembled in ONE fixed double expression written
identically on both engines, and LN terms fold per document in
explicit position order — the q_text_perplexity_bigram discipline.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import register

_KN_D = 0.75  # absolute discount (dyadic)


@register(
    "q_text_kneser_ney",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        doc_big AS (
            SELECT doc_id,
                   UNNEST(range(1, len(tok))) AS pos,
                   UNNEST(list_transform(range(1, len(tok)),
                          i -> tok[i] || ' ' || tok[i + 1])) AS bigram
            FROM tok WHERE len(tok) >= 2
        ),
        bc AS MATERIALIZED (
            SELECT bigram, COUNT(*) AS c FROM doc_big GROUP BY bigram
        ),
        pc AS (
            -- per prefix: total continuations and DISTINCT followers
            SELECT string_split(bigram, ' ')[1] AS prefix,
                   CAST(SUM(c) AS BIGINT) AS cp,
                   CAST(COUNT(*) AS BIGINT) AS n1f
            FROM bc GROUP BY 1
        ),
        sc AS (
            -- per suffix: DISTINCT predecessors (continuation counts)
            SELECT string_split(bigram, ' ')[2] AS suffix,
                   CAST(COUNT(*) AS BIGINT) AS n1p
            FROM bc GROUP BY 1
        ),
        tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM bc),
        model AS MATERIALIZED (
            -- interpolated KN, one fixed double expression:
            -- p = (c - d)/cp + (d * n1f / cp) * (n1p / T)
            SELECT bc.bigram,
                   (CAST(bc.c AS DOUBLE) - {_KN_D}) / pc.cp
                   + (({_KN_D} * CAST(pc.n1f AS DOUBLE)) / pc.cp)
                     * (CAST(sc.n1p AS DOUBLE) / tt.t) AS p
            FROM bc
            JOIN pc ON pc.prefix = string_split(bc.bigram, ' ')[1]
            JOIN sc ON sc.suffix = string_split(bc.bigram, ' ')[2]
            CROSS JOIN tt
        ),
        scored AS (
            SELECT d.doc_id, d.pos, LN(m.p) AS lnp
            FROM doc_big d JOIN model m ON m.bigram = d.bigram
        ),
        folded AS (
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   LIST(lnp ORDER BY pos ASC) AS ls
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               ROUND(-list_reduce(list_prepend(0.0, ls), (acc, x) -> acc + x)
                     / CAST(n_bigrams AS DOUBLE), 6) AS avg_nll_kn
        FROM folded
    """,
    doc=(
        "Per-document avg negative log-likelihood under an "
        f"interpolated Kneser-Ney bigram LM (d = {_KN_D}, dyadic): "
        "every seen bigram is discounted absolutely and the freed "
        "mass routes through the CONTINUATION distribution (distinct "
        "left-contexts per word / bigram types) — versatility, not "
        "burstiness, which is why KN is the standard n-gram quality "
        "scorer. All model quantities are integer counts; the "
        "probability is ONE fixed double expression identical on both "
        "engines (c >= 1 so the max(c-d, 0) clamp is vacuous and "
        "omitted); LN terms fold per doc in explicit position order "
        "(the q_text_perplexity_bigram discipline). Scale: three "
        "partial-aggregated count tables + the type total, assembled "
        "by bigram-keyed joins — the model is a table, never a "
        "driver-side dictionary."
    ),
    tags=("text-analysis", "lm", "llm-pipeline"),
)
def q_text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import _doc_bigrams

    doc_big = _doc_bigrams(spark, sf_dir)
    bc = doc_big.groupBy("bigram").agg(F.count("*").alias("c"))
    prefix = F.split(F.col("bigram"), " ")[0]
    suffix = F.split(F.col("bigram"), " ")[1]
    pc = bc.groupBy(prefix.alias("prefix")).agg(
        F.sum("c").cast("bigint").alias("cp"),
        F.count("*").cast("bigint").alias("n1f"),
    )
    sc = bc.groupBy(suffix.alias("suffix")).agg(
        F.count("*").cast("bigint").alias("n1p")
    )
    tt = bc.agg(F.count("*").cast("bigint").alias("t"))
    p = (F.col("c").cast("double") - F.lit(_KN_D)) / F.col("cp") + (
        (F.lit(_KN_D) * F.col("n1f").cast("double")) / F.col("cp")
    ) * (F.col("n1p").cast("double") / F.col("t"))
    model = (
        bc.join(pc, prefix == F.col("prefix"))
        .join(sc, suffix == F.col("suffix"))
        .crossJoin(F.broadcast(tt))
        .select("bigram", p.alias("p"))
    )
    scored = doc_big.join(model, "bigram").select(
        "doc_id", "pos", F.log(F.col("p")).alias("lnp")
    )
    folded = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lnp"))),
            lambda x: x["lnp"],
        ).alias("ls"),
    )
    s = F.aggregate(F.col("ls"), F.lit(0.0), lambda acc, x: acc + x)
    return folded.select(
        "doc_id",
        "n_bigrams",
        F.round(-s / F.col("n_bigrams").cast("double"), 6).alias(
            "avg_nll_kn"
        ),
    )
