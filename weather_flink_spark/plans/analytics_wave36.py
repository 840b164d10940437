"""Wave-36 operator (round 6, continued): Heaps'-law vocabulary
growth.

- ``q_text_heaps_law`` — vocabulary growth and the Heaps exponent
  (V = K·n^beta): vocabulary size at five corpus prefixes (by doc_id)
  against cumulative token counts, log-log OLS for (ln K, beta). The
  growth curve is THE corpus-health diagnostic dedup and contamination
  work watches: a beta far above the typical 0.4-0.6 band means
  unbounded novel-token churn (OCR noise, serial numbers); far below
  means heavy duplication. Prefix vocab sizes come from ONE pass —
  each distinct token keeps its FIRST document id, then vocab(k) =
  #tokens with first_doc <= k (never k separate distinct scans); the
  five (ln n, ln V) points pivot onto one row and the 2-parameter OLS
  is a fixed left-associated double expression identical on both
  engines.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_HEAPS_KS = (100, 200, 300, 400, 500)  # doc_id prefix checkpoints


def _heaps_fit_sql() -> tuple[str, str]:
    """(sum-defs, fit-select) text shared conceptually by both engines:
    explicit left-assoc 5-point sums, beta/lnK via 2-param OLS."""
    xs = [f"lnn{k}" for k in _HEAPS_KS]
    ys = [f"lnv{k}" for k in _HEAPS_KS]
    sx = " + ".join(xs)
    sy = " + ".join(ys)
    sxx = " + ".join(f"{x} * {x}" for x in xs)
    sxy = " + ".join(f"{x} * {y}" for x, y in zip(xs, ys))
    m = len(_HEAPS_KS)
    beta = (
        f"({m}.0 * ({sxy}) - ({sx}) * ({sy}))"
        f" / ({m}.0 * ({sxx}) - ({sx}) * ({sx}))"
    )
    lnk = f"(({sy}) - ({beta}) * ({sx})) / {m}.0"
    return beta, lnk


@register(
    "q_text_heaps_law",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, UNNEST(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS t
            FROM documents
        ),
        first_doc AS (
            SELECT t, MIN(doc_id) AS fd FROM tok GROUP BY t
        ),
        doc_tokens AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt
            FROM tok GROUP BY doc_id
        ),
        pts AS (
            SELECT
                {", ".join(
                    f"LN(CAST((SELECT SUM(nt) FROM doc_tokens WHERE doc_id < {k}) AS DOUBLE)) AS lnn{k},"
                    f" LN(CAST((SELECT COUNT(*) FROM first_doc WHERE fd < {k}) AS DOUBLE)) AS lnv{k},"
                    f" (SELECT SUM(nt) FROM doc_tokens WHERE doc_id < {k}) AS n{k},"
                    f" (SELECT COUNT(*) FROM first_doc WHERE fd < {k}) AS v{k}"
                    for k in _HEAPS_KS
                )}
        )
        SELECT {", ".join(f"CAST(n{k} AS BIGINT) AS n{k}, CAST(v{k} AS BIGINT) AS v{k}" for k in _HEAPS_KS)},
               ROUND({_heaps_fit_sql()[0]}, 9) AS heaps_beta,
               ROUND({_heaps_fit_sql()[1]}, 9) AS heaps_lnk
        FROM pts
    """,
    doc=(
        "Heaps'-law vocabulary growth (V = K*n^beta): vocabulary and "
        "token totals at five doc-id prefixes, log-log OLS for the "
        "exponent — the corpus-health diagnostic dedup/contamination "
        "work watches (beta above ~0.6: unbounded novel-token churn; "
        "below ~0.4: heavy duplication). ONE pass: each distinct "
        "token keeps its FIRST doc id (a partial-aggregated MIN), so "
        "vocab(k) is a conditional count over that table — never k "
        "separate distinct scans of the corpus. The five (ln n, ln V) "
        "points pivot onto one row; the OLS is a fixed left-assoc "
        "double expression identical on both engines. Scale: the "
        "first-doc table is vocabulary-sized; everything else is "
        "5-point math."
    ),
    tags=("text", "llm-pipeline", "diagnostics"),
)
def q_text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), t -> t <> '')")
        ).alias("t"),
    )
    first_doc = tok.groupBy("t").agg(F.min("doc_id").alias("fd"))
    doc_tokens = tok.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("nt")
    )
    aggs = []
    for k in _HEAPS_KS:
        aggs.append(
            F.sum(F.when(F.col("doc_id") < k, F.col("nt")))
            .cast("bigint")
            .alias(f"n{k}")
        )
    n_row = doc_tokens.agg(*aggs)
    vaggs = []
    for k in _HEAPS_KS:
        vaggs.append(
            F.sum(F.when(F.col("fd") < k, 1).otherwise(0))
            .cast("bigint")
            .alias(f"v{k}")
        )
    v_row = first_doc.agg(*vaggs)
    pts = n_row.crossJoin(F.broadcast(v_row))
    for k in _HEAPS_KS:
        pts = pts.withColumn(
            f"lnn{k}", F.log(F.col(f"n{k}").cast("double"))
        ).withColumn(f"lnv{k}", F.log(F.col(f"v{k}").cast("double")))
    beta_sql, lnk_sql = _heaps_fit_sql()
    return pts.select(
        *[c for k in _HEAPS_KS for c in (f"n{k}", f"v{k}")],
        F.round(F.expr(beta_sql), 9).alias("heaps_beta"),
        F.round(F.expr(lnk_sql), 9).alias("heaps_lnk"),
    )
