"""Wave-37 operators (round 6, continued): Neyman allocation and kNN
label consistency.

- ``q_sample_neyman`` — variance-optimal stratified allocation
  (Neyman 1934): per-stratum sample sizes n_h ∝ N_h·S_h under a fixed
  total budget, against the proportional allocation baseline — the
  survey-sampling upgrade to q_sample_stratified's fixed rates (put
  budget where the VARIANCE is, not where the volume is). Strata are
  event types over value; the per-stratum std comes from the exact-
  decimal moment discipline with one rounding; the five N_h·S_h terms
  pivot onto one row and normalize in a fixed left-assoc chain.
- ``q_emb_knn_label_accuracy`` — label consistency of the embedding
  space through the cached kNN index: each vector's predicted label is
  the majority label of its out-neighbors ((count DESC, label ASC)
  argmax — the LPA tie-break), accuracy per true label. This is the
  standard cheap embedding-quality eval (a space whose neighbors
  disagree with labels will retrieve garbage no matter how good the
  ANN index is) and it reuses the wave-20 knn_edges_table, so the
  eval costs one join + two groupBys.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Neyman allocation
# ---------------------------------------------------------------------------

_NEY_BUDGET = 1000
_NEY_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_sample_neyman",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(value AS DECIMAL(14,6))) AS s,
                   SUM(CAST(value AS DECIMAL(14,6))
                       * CAST(value AS DECIMAL(14,6))) AS ss
            FROM events GROUP BY event_type
        ),
        sd AS (
            SELECT event_type, n,
                   ROUND(SQRT(ROUND((CAST(ss AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                             / (n - 1.0), 6)), 6) AS sh
            FROM m
        ),
        piv AS (
            SELECT
                {", ".join(
                    f"MAX(CASE WHEN event_type = '{t}' THEN n END) AS n_{t},"
                    f" MAX(CASE WHEN event_type = '{t}' THEN sh END) AS sh_{t}"
                    for t in _NEY_TYPES
                )}
            FROM sd
        ),
        tot AS (
            SELECT *,
                   ({" + ".join(f"n_{t} * sh_{t}" for t in _NEY_TYPES)})
                       AS w_total,
                   ({" + ".join(f"n_{t}" for t in _NEY_TYPES)}) AS n_total
            FROM piv
        )
        {" UNION ALL ".join(
            f'''SELECT '{t}' AS event_type, n_{t} AS n, sh_{t} AS sh,
                   CAST(FLOOR({_NEY_BUDGET}.0 * (n_{t} * sh_{t}) / w_total)
                        AS BIGINT) AS n_neyman,
                   CAST(FLOOR({_NEY_BUDGET}.0 * n_{t} / n_total)
                        AS BIGINT) AS n_proportional,
                   ROUND({_NEY_BUDGET}.0 * (n_{t} * sh_{t}) / w_total
                         / n_{t}, 9) AS rate_neyman
            FROM tot'''
            for t in _NEY_TYPES
        )}
    """,
    doc=(
        f"Neyman (variance-optimal) stratified allocation of a "
        f"{_NEY_BUDGET}-row budget across event types: n_h ∝ N_h·S_h, "
        "side by side with the proportional baseline — the survey-"
        "sampling upgrade to q_sample_stratified's fixed rates (budget "
        "goes where the VARIANCE is; a high-variance small stratum "
        "outranks a low-variance big one). Parity: per-stratum std "
        "from exact DECIMAL moments with one rounding each; the five "
        "N·S weights pivot onto one row and normalize in a fixed "
        "left-assoc chain — no aggregation order touches a double. "
        "Scale: one conditional-aggregation pass, then 5-row math."
    ),
    tags=("sampling", "stats", "allocation"),
)
def q_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(14,6)")
    m = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )
    sd = m.select(
        "event_type",
        "n",
        F.round(
            F.sqrt(
                F.round(
                    (
                        F.col("ss").cast("double")
                        - F.col("s").cast("double")
                        * F.col("s").cast("double")
                        / F.col("n")
                    )
                    / (F.col("n") - F.lit(1.0)),
                    6,
                )
            ),
            6,
        ).alias("sh"),
    )
    piv = sd.agg(
        *[
            agg
            for t in _NEY_TYPES
            for agg in (
                F.max(F.when(F.col("event_type") == t, F.col("n"))).alias(
                    f"n_{t}"
                ),
                F.max(F.when(F.col("event_type") == t, F.col("sh"))).alias(
                    f"sh_{t}"
                ),
            )
        ]
    )
    w_total = F.col(f"n_{_NEY_TYPES[0]}") * F.col(f"sh_{_NEY_TYPES[0]}")
    n_total = F.col(f"n_{_NEY_TYPES[0]}")
    for t in _NEY_TYPES[1:]:
        w_total = w_total + F.col(f"n_{t}") * F.col(f"sh_{t}")
        n_total = n_total + F.col(f"n_{t}")
    tot = piv.select("*", w_total.alias("w_total"), n_total.alias("n_total"))
    rows = []
    for t in _NEY_TYPES:
        w = F.col(f"n_{t}") * F.col(f"sh_{t}")
        rows.append(
            tot.select(
                F.lit(t).alias("event_type"),
                F.col(f"n_{t}").alias("n"),
                F.col(f"sh_{t}").alias("sh"),
                F.floor(F.lit(float(_NEY_BUDGET)) * w / F.col("w_total"))
                .cast("bigint")
                .alias("n_neyman"),
                F.floor(
                    F.lit(float(_NEY_BUDGET))
                    * F.col(f"n_{t}")
                    / F.col("n_total")
                )
                .cast("bigint")
                .alias("n_proportional"),
                F.round(
                    F.lit(float(_NEY_BUDGET))
                    * w
                    / F.col("w_total")
                    / F.col(f"n_{t}"),
                    9,
                ).alias("rate_neyman"),
            )
        )
    res = rows[0]
    for r in rows[1:]:
        res = res.unionByName(r)
    return res


# ---------------------------------------------------------------------------
# kNN label consistency
# ---------------------------------------------------------------------------


def _knn_acc_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave20 import SZ_CTE, knn_edges_cte
    from weather_flink_spark.plans.llm_extra import ivf_assigned_cte

    return f"""
        WITH {ivf_assigned_cte()},
        {SZ_CTE},
        {knn_edges_cte()},
        votes AS (
            SELECT e.src AS vec_id, l.label, COUNT(*) AS c
            FROM edges e
            JOIN embeddings l ON l.vec_id = e.dst
            GROUP BY 1, 2
        ),
        pred AS (
            SELECT vec_id, label AS pred_label FROM (
                SELECT vec_id, label, ROW_NUMBER() OVER (
                    PARTITION BY vec_id
                    ORDER BY c DESC, label ASC) AS rk
                FROM votes
            ) WHERE rk = 1
        )
        SELECT t.label,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN p.pred_label = t.label
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               ROUND(CAST(SUM(CASE WHEN p.pred_label = t.label
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS accuracy
        FROM pred p JOIN embeddings t ON t.vec_id = p.vec_id
        GROUP BY t.label
    """


@register(
    "q_emb_knn_label_accuracy",
    oracle=_knn_acc_oracle(),
    doc=(
        "kNN label consistency of the embedding space — the standard "
        "cheap embedding-quality eval (neighbors that disagree with "
        "labels retrieve garbage regardless of index quality): each "
        "vector's predicted label is the majority label of its top-8 "
        "out-neighbors in the session-cached wave-20 kNN index "
        "((count DESC, label ASC) argmax — the LPA tie-break), "
        "accuracy per true label. Scale: the eval is one edge-keyed "
        "join + two partial-aggregated groupBys over the FIXED index "
        "artifact — it costs nothing beyond the index every searcher "
        "already shares. Directed out-edges (not the symmetrized "
        "graph): prediction uses each node's own retrieval list, "
        "exactly what a serving system would return."
    ),
    tags=("embedding", "similarity", "evaluation"),
)
def q_emb_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave20 import knn_edges_table

    e = knn_edges_table(spark, sf_dir)
    lab = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    votes = (
        e.join(lab.select(F.col("vec_id").alias("dst"), "label"), "dst")
        .groupBy(F.col("src").alias("vec_id"), "label")
        .agg(F.count("*").alias("c"))
    )
    pred = votes.groupBy("vec_id").agg(
        F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("b")
    ).select("vec_id", (-F.col("b.nl")).alias("pred_label"))
    truth = lab.select("vec_id", F.col("label").alias("true_label"))
    return (
        pred.join(truth, "vec_id")
        .groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .select(
            "label",
            "n",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n"), 6
            ).alias("accuracy"),
        )
    )
