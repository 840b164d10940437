"""Wave-63 operators (round 9): classifier evaluation + vocabulary
coverage — the ML-eval surface of the curation pipeline.

- ``q_eval_langid_confusion`` — per-class precision/recall/F1 for the
  engine's langid classifier against the documents' true labels: the
  standard confusion-matrix rollup every model-quality dashboard
  starts from. tp/fp/fn come from ONE (true, pred) count table;
  f1 = 2*tp / (n_pred + n_true) exactly (the algebraic form that
  avoids composing two rounded ratios). Classes with zero predictions
  report precision 0 by convention.

- ``q_stats_cohens_kappa`` — chance-corrected agreement between
  lang_pred and lang_true (Cohen 1960): po = trace/n, pe = sum of
  marginal products / n^2, kappa = (po-pe)/(1-pe). Integer counts
  everywhere; three double divisions at the end, identical IEEE forms
  on both engines. The scalar a curation run alerts on when a
  classifier drifts against a labeled audit slice.

- ``q_text_oov_rate`` — out-of-vocabulary rate per source against the
  corpus' own top-256 token vocabulary (count desc, token asc
  tie-break): the coverage signal that decides whether a tokenizer's
  vocab fits a new source. Vocab selection is a distributed
  sort+limit (TakeOrdered — never a partitionless window); the
  scoring join broadcasts the 256-row vocab.

All three share the engine's evaluation posture: the classifier under
test IS the registered one (the langid oracle text is shared via
llm_extra.LANGID_ORACLE, so evaluation can never drift from the
classifier), and every metric is integer counting until final
divisions.

Scale: confusion is a (true,pred)-keyed groupBy (<= |langs|^2 rows);
kappa folds that same bounded table; OOV is one token explode +
count + a broadcast-vocab join — all partial-aggregated, no
data-sized model state.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_VOCAB_K = 256


def _confusion_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import LANGID_ORACLE

    return f"""
        WITH pred AS MATERIALIZED ({LANGID_ORACLE}),
        cm AS (
            SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS c
            FROM pred GROUP BY lang_true, lang_pred
        ),
        classes AS (SELECT DISTINCT lang_true AS lang FROM cm),
        per AS (
            SELECT k.lang,
                   CAST(COALESCE(SUM(CASE WHEN cm.lang_true = k.lang
                                           AND cm.lang_pred = k.lang
                                          THEN cm.c END), 0) AS BIGINT) AS tp,
                   CAST(COALESCE(SUM(CASE WHEN cm.lang_true = k.lang
                                          THEN cm.c END), 0) AS BIGINT)
                       AS n_true,
                   CAST(COALESCE(SUM(CASE WHEN cm.lang_pred = k.lang
                                          THEN cm.c END), 0) AS BIGINT)
                       AS n_pred
            FROM classes k LEFT JOIN cm
              ON cm.lang_true = k.lang OR cm.lang_pred = k.lang
            GROUP BY k.lang
        )
        SELECT lang, tp, n_true, n_pred,
               CASE WHEN n_pred = 0 THEN 0.0
                    ELSE CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)
               END AS precision,
               CASE WHEN n_true = 0 THEN 0.0
                    ELSE CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE)
               END AS recall,
               CASE WHEN n_pred + n_true = 0 THEN 0.0
                    ELSE CAST(2 * tp AS DOUBLE)
                         / CAST(n_pred + n_true AS DOUBLE)
               END AS f1
        FROM per
    """


@register(
    "q_eval_langid_confusion",
    oracle=_confusion_oracle(),
    doc=(
        "Per-class precision/recall/F1 of the langid classifier "
        "against true labels (r9) — the confusion-matrix rollup of "
        "the ML-eval surface. One (true,pred) groupBy (<= |langs|^2 "
        "rows) folded to per-class tp/n_true/n_pred; f1 computed as "
        "2tp/(n_pred+n_true) so no rounded ratios compose. The "
        "classifier under test IS the registered q_text_langid (the "
        "oracle shares its exact text via LANGID_ORACLE — evaluation "
        "can never drift from the classifier)."
    ),
    tags=("eval", "text", "langid", "ml-eval"),
)
def q_eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import q_text_langid

    pred = q_text_langid(spark, sf_dir)
    cm = pred.groupBy("lang_true", "lang_pred").agg(
        F.count("*").cast("bigint").alias("c")
    )
    classes = cm.select(F.col("lang_true").alias("lang")).distinct()
    joined = classes.join(
        cm,
        (F.col("lang_true") == F.col("lang"))
        | (F.col("lang_pred") == F.col("lang")),
        "left",
    )
    per = joined.groupBy("lang").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang_true") == F.col("lang"))
                    & (F.col("lang_pred") == F.col("lang")),
                    F.col("c"),
                )
            ),
            F.lit(0),
        ).cast("bigint").alias("tp"),
        F.coalesce(
            F.sum(F.when(F.col("lang_true") == F.col("lang"), F.col("c"))),
            F.lit(0),
        ).cast("bigint").alias("n_true"),
        F.coalesce(
            F.sum(F.when(F.col("lang_pred") == F.col("lang"), F.col("c"))),
            F.lit(0),
        ).cast("bigint").alias("n_pred"),
    )
    return per.select(
        "lang",
        "tp",
        "n_true",
        "n_pred",
        F.when(F.col("n_pred") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / F.col("n_pred").cast("double"))
        .alias("precision"),
        F.when(F.col("n_true") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / F.col("n_true").cast("double"))
        .alias("recall"),
        F.when(F.col("n_pred") + F.col("n_true") == 0, F.lit(0.0))
        .otherwise(
            (F.lit(2) * F.col("tp")).cast("double")
            / (F.col("n_pred") + F.col("n_true")).cast("double")
        )
        .alias("f1"),
    )


def _kappa_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import LANGID_ORACLE

    return f"""
        WITH pred AS MATERIALIZED ({LANGID_ORACLE}),
        cm AS (
            SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS c
            FROM pred GROUP BY lang_true, lang_pred
        ),
        n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cm),
        agree AS (
            SELECT CAST(COALESCE(SUM(CASE WHEN lang_true = lang_pred
                                          THEN c END), 0) AS BIGINT) AS agree
            FROM cm
        ),
        marg AS (
            SELECT CAST(SUM(t.ct * p.cp) AS BIGINT) AS s
            FROM (SELECT lang_true AS lang, SUM(c) AS ct FROM cm
                  GROUP BY lang_true) t
            JOIN (SELECT lang_pred AS lang, SUM(c) AS cp FROM cm
                  GROUP BY lang_pred) p ON p.lang = t.lang
        )
        SELECT n.n AS n_docs, agree.agree,
               CAST(agree.agree AS DOUBLE) / CAST(n.n AS DOUBLE) AS po,
               CAST(marg.s AS DOUBLE)
                   / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)) AS pe,
               (CAST(agree.agree AS DOUBLE) / CAST(n.n AS DOUBLE)
                - CAST(marg.s AS DOUBLE)
                  / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)))
               / (1.0 - CAST(marg.s AS DOUBLE)
                  / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE))) AS kappa
        FROM n CROSS JOIN agree CROSS JOIN marg
    """


@register(
    "q_stats_cohens_kappa",
    oracle=_kappa_oracle(),
    doc=(
        "Cohen's kappa between the langid prediction and the true "
        "label (r9): chance-corrected agreement po-pe/(1-pe) with "
        "po = trace/n and pe = marginal-product sum / n^2 — the "
        "drift-alert scalar for a classifier audited against a "
        "labeled slice. Integer counts throughout; three double "
        "divisions at the end in identical IEEE forms on both "
        "engines; the classifier under test is the registered one "
        "(shared LANGID_ORACLE text). Honest fixture read: kappa ~ 0 "
        "— the stopword markers rarely fire on the synthetic corpus, "
        "so agreement is chance-level even though raw accuracy po "
        "looks like signal. That divergence is exactly the metric's "
        "job, and the test pins it."
    ),
    tags=("stats", "eval", "ml-eval"),
)
def q_stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import q_text_langid

    pred = q_text_langid(spark, sf_dir)
    cm = pred.groupBy("lang_true", "lang_pred").agg(
        F.count("*").cast("bigint").alias("c")
    )
    n = cm.agg(F.sum("c").cast("bigint").alias("n"))
    agree = cm.agg(
        F.coalesce(
            F.sum(F.when(F.col("lang_true") == F.col("lang_pred"), F.col("c"))),
            F.lit(0),
        ).cast("bigint").alias("agree")
    )
    t = cm.groupBy(F.col("lang_true").alias("lang")).agg(
        F.sum("c").alias("ct")
    )
    p = cm.groupBy(F.col("lang_pred").alias("lang")).agg(
        F.sum("c").alias("cp")
    )
    marg = t.join(p, "lang").agg(
        F.sum(F.col("ct") * F.col("cp")).cast("bigint").alias("s")
    )
    nd = F.col("n").cast("double")
    po = F.col("agree").cast("double") / nd
    pe = F.col("s").cast("double") / (nd * nd)
    return (
        n.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(marg))
        .select(
            F.col("n").alias("n_docs"),
            "agree",
            po.alias("po"),
            pe.alias("pe"),
            ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
        )
    )


@register(
    "q_text_oov_rate",
    oracle=f"""
        WITH tokens AS (
            SELECT source, UNNEST(string_split(text, ' ')) AS t
            FROM documents
        ),
        vocab AS MATERIALIZED (
            SELECT t FROM (
                SELECT t, COUNT(*) AS c FROM tokens GROUP BY t
            ) ORDER BY c DESC, t ASC LIMIT {_VOCAB_K}
        )
        SELECT tk.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
               CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS oov_rate
        FROM tokens tk LEFT JOIN vocab v ON v.t = tk.t
        GROUP BY tk.source
    """,
    doc=(
        "Out-of-vocabulary rate per source against the corpus' own "
        "top-256 token vocabulary (r9) — the coverage signal that "
        "decides whether a tokenizer vocab fits a new source (high "
        "OOV = the source needs vocab growth or transliteration). "
        "Vocab selection is a distributed sort+limit with a "
        "deterministic (count desc, token asc) tie-break — never a "
        "partitionless window; scoring is one broadcast-vocab join "
        "over the exploded tokens, partial-aggregated per source."
    ),
    tags=("text", "tokens", "llm-pipeline"),
)
def q_text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    vocab = (
        tokens.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(_VOCAB_K)
        .select("t")
    )
    joined = tokens.join(
        F.broadcast(vocab.withColumnRenamed("t", "vt")),
        F.col("t") == F.col("vt"),
        "left",
    )
    return joined.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("vt").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        (
            F.sum(F.when(F.col("vt").isNull(), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("oov_rate"),
    )
