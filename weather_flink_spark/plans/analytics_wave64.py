"""Wave-64 operators (round 9): Benford first-digit audit + kNN-graph
hubness diagnostic.

- ``q_stats_benford`` — Benford's-law first-significant-digit audit
  over order totals (Benford 1938; the classic fraud/data-quality
  screen): observed share per leading digit vs the Benford expectation
  log10(1 + 1/d), with the per-digit chi-square contribution
  (obs - n*p)^2 / (n*p). The nine expected shares are Python-computed
  doubles injected as literals into BOTH engines (the ``_dlit``
  discipline) — no libm log10 parity risk. Digit extraction is pure
  integer/string arithmetic on floor(totalprice).

- ``q_emb_knn_hubness`` — in-degree distribution of the shared
  digit-scaled multi-probe kNN index (the graph-ANN base layer;
  degree 8 / probe 2 at the d=3 fixture): one row
  per in-degree with its node count. The 0-in-degree row is the
  ANTIHUB count — nodes NO beam search can ever reach through edges
  (only via entry seeding), the standard hubness failure mode of
  kNN graphs in high dimensions (Radovanovic et al. 2010) and a
  direct explanator for the flat tier's recall ceiling the wave-58
  panel measures. Composes the session-cached index table; the
  oracle replays the shared knn_edges_cte text so the diagnostic can
  never drift from the index it diagnoses.

Scale: Benford is one projection + a 9-row groupBy (partial-agg);
hubness is one groupBy over the persisted edge list + a broadcast
anti-join for the zero row — both linear, no new shapes.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# Benford expectations as exact Python doubles, injected literally on
# both sides (never computed via each engine's libm log10)
_BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def _benford_oracle() -> str:
    p_cases = " ".join(
        f"WHEN {d} THEN CAST('{_BENFORD_P[d]!r}' AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"""
        WITH digits AS (
            SELECT CAST(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)[1]
                        AS INTEGER) AS digit
            FROM orders WHERE o_totalprice >= 1
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits),
        obs AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
            FROM digits GROUP BY digit
        ),
        grid AS (SELECT UNNEST(range(1, 10)) AS digit)
        SELECT g.digit,
               CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
               CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
                   / CAST((SELECT n FROM n) AS DOUBLE) AS obs_share,
               CASE g.digit {p_cases} END AS exp_share,
               (CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
                - CAST((SELECT n FROM n) AS DOUBLE)
                  * (CASE g.digit {p_cases} END))
               * (CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
                  - CAST((SELECT n FROM n) AS DOUBLE)
                    * (CASE g.digit {p_cases} END))
               / (CAST((SELECT n FROM n) AS DOUBLE)
                  * (CASE g.digit {p_cases} END)) AS chi2_term
        FROM grid g LEFT JOIN obs o ON o.digit = g.digit
    """


@register(
    "q_stats_benford",
    oracle=_benford_oracle(),
    doc=(
        "Benford's-law first-digit audit over order totals (r9) — the "
        "classic fraud/data-quality screen: observed vs expected "
        "log10(1+1/d) share per leading digit with per-digit "
        "chi-square contributions. Expected shares are Python doubles "
        "injected literally on BOTH engines (no libm log10 parity "
        "risk); digit extraction is integer/string arithmetic on "
        "floor(price). One projection + a 9-row groupBy."
    ),
    tags=("stats", "quality", "audit"),
)
def q_stats_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    n = digits.agg(F.count("*").cast("bigint").alias("n"))
    obs = digits.groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n_obs")
    )
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    p = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(_BENFORD_P[d]))
        ]
    )[F.col("digit")]
    nd = F.col("n").cast("double")
    n_obs = F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint")
    dev = n_obs.cast("double") - nd * p
    return (
        grid.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            n_obs.alias("n_obs"),
            (n_obs.cast("double") / nd).alias("obs_share"),
            p.alias("exp_share"),
            (dev * dev / (nd * p)).alias("chi2_term"),
        )
    )


def _hubness_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave20 import SZ_CTE, knn_edges_cte
    from weather_flink_spark.plans.llm_extra import ivf_assigned_cte

    return f"""
        WITH {ivf_assigned_cte()},
        {SZ_CTE},
        {knn_edges_cte()},
        indeg AS (
            SELECT e.vec_id,
                   CAST(COUNT(g.src) AS BIGINT) AS in_degree
            FROM embeddings e
            LEFT JOIN edges g ON g.dst = e.vec_id
            GROUP BY e.vec_id
        )
        SELECT in_degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM indeg GROUP BY in_degree
    """


@register(
    "q_emb_knn_hubness",
    oracle=_hubness_oracle(),
    doc=(
        "In-degree distribution of the shared digit-scaled multi-probe "
        "kNN index (r9; r10: degree 4(d-1) / probe d-1 — 8/2 at the "
        "d=3 fixture, 12/3 at sf0.1) — the hubness diagnostic for the graph-ANN "
        "base layer (Radovanovic 2010): one row per in-degree with "
        "its node count. The in_degree=0 row counts ANTIHUBS — nodes "
        "no beam search can reach through edges (only entry seeding "
        "finds them), a direct explanator of the flat tier's recall "
        "ceiling the wave-58 panel measures. Composes the "
        "session-cached index; the oracle replays the SAME shared "
        "knn_edges_cte text, so the diagnostic can never drift from "
        "the index it diagnoses."
    ),
    tags=("similarity", "ann", "graph", "evaluation", "diagnostics"),
)
def q_emb_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave20 import knn_edges_table
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table

    nodes = ivf_assigned_table(spark, sf_dir).select("vec_id")
    edges = knn_edges_table(spark, sf_dir)
    indeg = (
        nodes.join(edges, edges.dst == nodes.vec_id, "left")
        .groupBy("vec_id")
        .agg(F.count("src").cast("bigint").alias("in_degree"))
    )
    return indeg.groupBy("in_degree").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
